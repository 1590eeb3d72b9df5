"""LLM-data-pipeline operators: deduplication + text analysis —
SURVEY.md §2 group J (j1-j7) plus the north-star extensions (lang-id,
quality scoring, token counting, fingerprinting).

All hot paths are native Column expressions (higher-order array
functions, engine-portable md5-based hashing); Python appears only in
the SimHash variant (a deliberately-Arrow'd pandas UDF, see udfs.py for
the family).

Scale notes: MinHash-LSH is *the* 100 TB dedup path — shingle → k
salted min-hashes → band keys → groupBy band (shuffle is bounded by
(docs × bands), not docs²) → verify only candidates.  Exact dedup is a
hash groupBy.  The pairwise-Jaccard variant is quadratic per shared
n-gram and exists for corpora small enough to verify exhaustively.
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas_udf type hints must resolve here
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.operators.session_cache import cache_put, register_cache
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load, spread_small_scan

# ---------------------------------------------------------------------------
# Shared text expressions
# ---------------------------------------------------------------------------


def words_of(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def word_shingles(col: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles (assumes ≥ n words, true for the
    corpus — FIXTURES.md documents ≥ 48 chars of word salad)."""
    w = words_of(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )


def hash64(col: Column) -> Column:
    """Engine-portable 60-bit integer hash: md5 hex prefix → BIGINT.
    (xxhash64/hash are engine-specific — never in checked output.)"""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash31_fast(col: Column) -> Column:
    """xxhash64-based 31-bit hash — the PRODUCTION alternative to
    hash31_md5 (codegen-friendly, no md5 + hex-parse cost) for
    deployments that do not need the DuckDB oracle replay.  Not used by
    any registered query: the oracle-checked MinHash core deliberately
    uses hash31_md5, and swapping this in there would break the
    structural j3/j23/k10 oracles (they replay the md5 hashes)."""
    return F.pmod(F.xxhash64(col), F.lit(_MERSENNE))


def hash31_md5(col: Column) -> Column:
    """DuckDB-replicable 31-bit hash: 60 bits of md5 hex folded mod the
    Mersenne prime — DuckDB computes the identical value as
    ``('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647``.  The
    MinHash core uses this (not xxhash64) so the j3/j23/k10 oracles can
    replay the banding structurally; md5 costs ~2-3× xxhash64 on the
    hashing stage only, a constant factor the structural gate buys."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % _MERSENNE


# ---------------------------------------------------------------------------
# Dedup (j1-j3)
# ---------------------------------------------------------------------------


@register(
    "j1_dedup_exact",
    oracle="""
SELECT DISTINCT doc_id, lang, source FROM (
  SELECT doc_id, lang, source FROM documents
  UNION ALL
  SELECT doc_id, lang, source FROM documents
)
""",
)
def j1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j1: exact row dedup (hash groupBy).  The corpus has no duplicate
    rows (FIXTURES), so the duplicate load is a self-union; survivors
    are full-row-identical so the kept copy is immaterial."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return d.unionByName(d).dropDuplicates()


@register(
    "j2_dedup_content_hash",
    oracle="""
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
)
GROUP BY md5(text)
""",
)
def j2_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j2: content-hash dedup — md5(text) groups; deterministic survivor
    = MIN(doc_id).  Every text appears twice by construction, so
    n_copies = 2 everywhere proves the grouping."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.unionByName(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    return doubled.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    )


# 8 bands × 4 rows: at the corpus's verified-pair floor (~0.80 Jaccard)
# a 4-row band misses with ≤ 0.59 per band → ≤ 0.59^8 ≈ 1.5% per pair,
# ~5e-6 at the planted ~0.94 — empirically recall 1.0 at sf0.01.  The
# driver oracle replays the BANDING itself (md5-based hashes, DuckDB
# replay below), so gate equality is STRUCTURAL — a corpus change that
# introduces a borderline band-missed pair cannot turn it red (ADVICE
# r3); recall vs the exhaustive referee is attested separately by
# tests/test_llm_props.py::test_j3_lsh_recall_is_exhaustive.
_MINHASH_PERMS = 32
_MINHASH_BANDS = 8
_MINHASH_TAU = 0.5
_MERSENNE = (1 << 31) - 1


def _perm_constants(n_perms: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(1337)
    return [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE)) for _ in range(n_perms)]


def minhash_signature(shingles: Column, n_perms: int = _MINHASH_PERMS) -> Column:
    """MinHash via a universal hash family (Broder 1997): ONE md5 per
    shingle, then n_perms cheap (a·h + b) mod p permutations — 16×
    less hashing than salted-md5-per-permutation.  Base hash is folded
    to 31 bits so a·h stays in int64.  (Array-expression form; the j3
    operator uses the equivalent explode+groupBy form, which codegens
    leaner and shuffles only (doc, hash) longs.)"""
    base = F.transform(shingles, lambda s: hash31_md5(s))

    def perm(a: int, b: int):
        return lambda h: (a * h + b) % _MERSENNE

    return F.array(
        *[
            F.array_min(F.transform(base, perm(a, b)))
            for a, b in _perm_constants(n_perms)
        ]
    )


def minhash_signature_grouped(sh: DataFrame, n_perms: int = _MINHASH_PERMS) -> DataFrame:
    """Aggregation-form MinHash: explode shingles → one md5 per shingle →
    n_perms MIN aggregates per doc.  Same values as minhash_signature;
    partial aggregation means the shuffle carries n_perms longs per
    (doc × map-partition) — the 100 TB shape."""
    ex = sh.select("doc_id", F.explode("shingles").alias("s")).withColumn(
        "h", hash31_md5(F.col("s"))
    )
    aggs = [
        F.min((a * F.col("h") + b) % _MERSENNE).alias(f"m{p}")
        for p, (a, b) in enumerate(_perm_constants(n_perms))
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def band_keys(sig: Column, bands: int = _MINHASH_BANDS) -> Column:
    """LSH banding: hash each contiguous run of the signature; docs
    agreeing on ANY band become candidates."""
    r = _MINHASH_PERMS // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[sig[b * r + i] for i in range(r)]).alias("key"),
            )
            for b in range(bands)
        ]
    )


def banded_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, band, key) LSH band rows for a shingle table — the
    candidate-generation core shared by batch j3 and streaming k10.
    Keys are xxhash64 longs (8-byte shuffle keys, engine-internal —
    these ops are rows-only, never oracle-hashed)."""
    sig = minhash_signature_grouped(sh)
    r = _MINHASH_PERMS // _MINHASH_BANDS
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            *[F.col(f"m{band * r + i}") for i in range(r)]
                        ).alias("key"),
                    )
                    for band in range(_MINHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


# j3's persisted shingle subtree, keyed by (session id, sf_dir): bench's
# median-of-3 and interactive reuse hit the warm materialization.
# Bounded to one (app, sf_dir) generation by cache_put (ADVICE r8).
_J3_SHINGLE_CACHE: dict = register_cache({})


# Shared corpus/shingle CTE prefix for both j3 oracle forms: originals
# plus the planted perturbed twins, word-3-gram shingle sets.
_J3_CORPUS_CTES = """
WITH orig AS (SELECT doc_id, lower(text) AS t FROM documents),
pert AS (SELECT doc_id + 100000 AS doc_id,
                substring(lower(text), instr(lower(text), ' ') + 1) AS t
         FROM documents),
corpus AS (SELECT * FROM orig UNION ALL SELECT * FROM pert),
w AS (SELECT doc_id, string_split(t, ' ') AS w FROM corpus),
sh AS (SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(len(w) - 2, 1) + 1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
       FROM w)"""

# The EXHAUSTIVE referee: exact inverted-index prefilter (no false
# negatives for jaccard > 0) then exact Jaccard ≥ τ — ground truth for
# the recall attestation in tests/test_llm_props.py.  NOT the driver
# oracle: requiring LSH recall exactly 1.0 at the gate would make a
# future corpus with one borderline (τ..~0.8) pair permanently red.
_J3_EXHAUSTIVE_SQL = f"""{_J3_CORPUS_CTES},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id)
SELECT a_id, b_id,
       ROUND(len(list_intersect(x.s, y.s))::DOUBLE
             / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
FROM cand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / len(list_distinct(list_concat(x.s, y.s))) >= 0.5
"""


def _j3_oracle_sql() -> str:
    """The j3/j23/k10 driver oracle: replay the MinHash-LSH BANDING
    itself (md5-based 31-bit shingle hashes → the same 32 affine
    permutations → 8×4 band keys → band-sharing candidates), then exact
    Jaccard ≥ τ on the candidates — the identical pair-set DEFINITION
    the engine computes, so gate equality is structural rather than
    corpus-dependent (ADVICE r3).  The engine's band keys are xxhash64
    over the 4-tuple while the replay joins on the raw tuple; an
    xxhash64 collision creating a spurious high-Jaccard candidate is
    the only divergence and is astronomically unlikely (engine-internal
    8-byte keys, same caveat class as j3c's join hash)."""
    perms = _perm_constants(_MINHASH_PERMS)
    r = _MINHASH_PERMS // _MINHASH_BANDS
    min_cols = ",\n         ".join(
        f"MIN(({a} * hv + {b}) % {_MERSENNE}) AS m{p}" for p, (a, b) in enumerate(perms)
    )
    bandrows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {band} AS band, {cols} FROM mins".format(
            band=band,
            cols=", ".join(f"m{band * r + i} AS x{i}" for i in range(r)),
        )
        for band in range(_MINHASH_BANDS)
    )
    band_eq = " AND ".join(f"a.x{i} = b.x{i}" for i in range(r))
    return f"""{_J3_CORPUS_CTES},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
hv AS (SELECT doc_id,
              ('0x' || substr(md5(g), 1, 15))::BIGINT % {_MERSENNE} AS hv
       FROM inv),
mins AS (SELECT doc_id,
         {min_cols}
         FROM hv GROUP BY doc_id),
bandrows AS (
{bandrows}
),
bcand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM bandrows a JOIN bandrows b
            ON a.band = b.band AND {band_eq} AND a.doc_id < b.doc_id)
SELECT a_id, b_id,
       ROUND(len(list_intersect(x.s, y.s))::DOUBLE
             / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
FROM bcand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / len(list_distinct(list_concat(x.s, y.s))) >= {_MINHASH_TAU}
"""


_J3_ORACLE = _j3_oracle_sql()


@register("j3_dedup_near_minhash", oracle=_J3_ORACLE)
def j3_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3: near-duplicate pairs via shingling + MinHash-LSH banding,
    verified with exact Jaccard ≥ 0.5.  The query plants one perturbed
    copy per document (first word dropped, doc_id+100000) — the result
    must pair each doc with its perturbed twin plus the corpus's own
    organic near-dups.  Scale: candidates come from a groupBy on band
    keys, never a docs² join."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    # The corpus arrives as one small file → 1-2 input partitions, which
    # serializes the CPU-heavy shingle/hash stage; spread it across the
    # cluster first (at real scale the source is already many splits).
    corpus = d.unionByName(perturbed).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # The shingle table feeds three plan branches (signature + both sides
    # of verification); without persist Spark recomputes the shingling
    # per branch.  Small: (docs × distinct shingles) strings.  Cached per
    # (session, sf_dir) so repeated invocations in one session measure
    # steady state instead of re-materializing the same subtree.
    # Keyed on applicationId, not id(spark): CPython can reuse an object
    # id after a stopped session is garbage-collected, which would hand
    # back a DataFrame bound to the dead session (ADVICE r3).
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _J3_SHINGLE_CACHE.get(key)
    if cached is None:
        sh = (
            corpus.withColumn("shingles", word_shingles("text", 3))
            .select("doc_id", "shingles")
            .persist()
        )
        # Band join carries ids only — shingle arrays would bloat the
        # shuffle; they are re-joined for the (small) candidate set during
        # verification.  The banded table (docs × bands id rows) is tiny
        # but costs a full explode/groupBy pass to derive, so it is
        # cached alongside the shingles.
        banded = banded_signatures(sh).persist()
        cached = cache_put(_J3_SHINGLE_CACHE, key, (sh, banded))
    sh, banded = cached
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    # Fused verification: instead of re-joining sh once per pair side (two
    # full shuffles of the heavy shingle arrays), melt each candidate pair
    # to two (pair, doc_id, side) rows, join sh ONCE, and gather the two
    # sides back with a groupBy that shuffles only the candidate subset's
    # arrays — at 100 TB the corpus-sized shuffle happens once, not twice.
    melted = cand.select(
        "a_id",
        "b_id",
        F.explode(
            F.array(
                F.struct(F.col("a_id").alias("doc_id"), F.lit(0).alias("side")),
                F.struct(F.col("b_id").alias("doc_id"), F.lit(1).alias("side")),
            )
        ).alias("m"),
    ).select("a_id", "b_id", F.col("m.doc_id").alias("doc_id"), F.col("m.side").alias("side"))
    verified = (
        melted.join(sh, "doc_id")
        .groupBy("a_id", "b_id")
        .agg(
            F.first(F.when(F.col("side") == 0, F.col("shingles")), ignorenulls=True).alias("sh_a"),
            F.first(F.when(F.col("side") == 1, F.col("shingles")), ignorenulls=True).alias("sh_b"),
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= _MINHASH_TAU)
        .select("a_id", "b_id", "jaccard")
    )


@register(
    "j3b_dedup_simhash",
    # The oracle replays the ALGORITHM exactly — md5-derived 64-bit
    # sign-sum fingerprints (('0x'||hex)::UBIGINT parses the same 8
    # big-endian bytes Python reads), the same 16-bit chunk banding, the
    # same hamming ≤ 12 filter — so the banded candidate set itself is
    # hash-checked, recall trade-off and all.
    oracle="""
WITH corpus AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         substring(lower(text), instr(lower(text), ' ') + 1) FROM documents
),
tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM corpus),
h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS hv FROM tok),
bits AS (SELECT doc_id, i, SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS acc
         FROM h, range(0, 64) r(i) GROUP BY doc_id, i),
fp AS (SELECT doc_id,
              string_agg(CASE WHEN acc > 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS f
       FROM bits GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.f AS af, b.f AS bf
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE substr(a.f, 1, 16) = substr(b.f, 1, 16)
     OR substr(a.f, 17, 16) = substr(b.f, 17, 16)
     OR substr(a.f, 33, 16) = substr(b.f, 33, 16)
     OR substr(a.f, 49, 16) = substr(b.f, 49, 16)
)
SELECT a_id, b_id, hamming(af, bf) AS hamming
FROM cand WHERE hamming(af, bf) <= 12
""",
)
def j3b_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3 (SimHash variant, Charikar 2002): 64-bit sign-sum fingerprints
    via an Arrow-batched pandas UDF, near-dup pairs = hamming ≤ 12
    found through 16-bit chunk banding (a pair within hamming 3 of 64
    bits must agree on ≥1 of 4 chunks; wider radii may lose pairs —
    documented recall trade-off).  Same planted perturbed corpus as j3.
    The oracle replays the identical algorithm in SQL (see above), so
    the trade-off is pinned, not papered over.
    """
    import hashlib

    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            acc = [0] * 64
            for tok in (t or "").lower().split(" "):
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                for i in range(64):
                    acc[i] += 1 if (h >> i) & 1 else -1
            v = sum(1 << i for i, a in enumerate(acc) if a > 0)
            out.append(v - (1 << 64) if v >= 1 << 63 else v)  # to signed int64
        return pd.Series(out)

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    perturbed = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = d.unionByName(perturbed).withColumn("sh", simhash64("text"))
    chunks = corpus.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftrightunsigned("sh", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "sh", "c.ci", "c.cv")
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs.filter(F.col("hamming") <= 12)


# j3c's exhaustive referee oracle — kept for the test-side parity check
# (tests/test_llm_props.py::test_j3c_exhaustive_referee_parity).  j3c is
# deliberately NOT registered: it is Θ(Σ df²) in gram document frequency
# with no scale story (measured round 4: no df-cap separates this corpus
# without dropping real near-dups), so it must never enter the driver's
# sampled gate or be mistaken for a production path.  Its referee duty —
# attesting j3's banded pipeline against exhaustive ground truth — lives
# entirely in the test suite.
_J3C_ORACLE_SQL = """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(w) - 1),
                                      i -> w[i + 1] || ' ' || w[i + 2])) AS gs
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
), x AS (
  SELECT doc_id, unnest(gs) AS g FROM t
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
  FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), n AS (SELECT doc_id, len(gs) AS n FROM t)
SELECT a_id, b_id,
       ROUND(CAST(shared AS DOUBLE) / (na.n + nb.n - shared), 6) AS jaccard
FROM pairs
JOIN n na ON na.doc_id = a_id
JOIN n nb ON nb.doc_id = b_id
WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.2
"""


def j3c_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j3 (exhaustive variant): word-2-gram Jaccard ≥ 0.2 pairs via
    explode + equi-join on shared grams — oracle-checked in the test
    suite only (see _J3C_ORACLE_SQL above for why it is unregistered).

    This is the REFEREE, inherently Θ(Σ df²) in gram document
    frequency: on the bench corpus (tiny shared vocabulary, every gram
    common) no exact candidate pruning can separate — measured floor:
    qualifying pairs' rarest shared gram has df ≈ 0.05·N, so a df-cap
    that bounds the join also drops real near-dups.  The plan instead
    bounds the per-row cost: the self-join runs on xxhash64(gram)
    longs (8-byte keys; join-internal only, never in output — 931
    distinct grams make a colliding pair astronomically unlikely and
    it would surface as an oracle hash mismatch), partially aggregates
    map-side, and only then rejoins the tiny per-doc gram counts.
    Runs at sf0.1 (5k docs, 10.3M candidate pairs) in a default-1 GB
    local session; for anything bigger use the MinHash-LSH variant
    (j3) — that is the 100 TB path."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    t = d.select("doc_id", word_shingles("text", 2).alias("gs"))
    x = t.select("doc_id", F.explode("gs").alias("g")).select(
        "doc_id", F.xxhash64("g").alias("gh")
    )
    a, b = x.alias("a"), x.alias("b")
    pairs = (
        a.join(b, (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("shared"))
    )
    n = t.select("doc_id", F.size("gs").alias("n"))
    jac = F.col("shared") / (F.col("na.n") + F.col("nb.n") - F.col("shared"))
    return (
        pairs.join(n.alias("na"), F.col("na.doc_id") == F.col("a_id"))
        .join(n.alias("nb"), F.col("nb.doc_id") == F.col("b_id"))
        .filter(jac >= 0.2)
        .select("a_id", "b_id", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# Text analysis (j4-j7 + extensions)
# ---------------------------------------------------------------------------


@register(
    "j4_text_tokenize_wordcount",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
GROUP BY word
""",
)
def j4_text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j4: corpus term frequencies — split → explode → count."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(words_of()).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "j5_text_ngrams",
    oracle="""
SELECT g AS bigram, COUNT(*) AS n
FROM (
  SELECT unnest(list_transform(range(len(w) - 1), i -> w[i + 1] || ' ' || w[i + 2])) AS g
  FROM (SELECT string_split(lower(text), ' ') AS w FROM documents)
)
GROUP BY g
""",
)
def j5_text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j5: corpus word-bigram frequencies (non-distinct per doc)."""
    d = load(spark, sf_dir, "documents")
    w = words_of()
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
    )
    return (
        d.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
    )


@register(
    "j6_tf_idf",
    oracle="""
WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
dfq AS (SELECT word, COUNT(DISTINCT doc_id) AS dfc FROM w GROUP BY word),
nd AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, word, tf,
       ROUND(tf * ln(CAST(n_docs AS DOUBLE) / dfc), 6) AS tfidf
FROM tf JOIN dfq USING (word), nd
""",
)
def j6_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j6: tf × ln(N/df) term weighting.  N comes from a 1-row aggregate
    cross-joined in (never a driver-side collect), so the plan stays
    fully lazy and SF-independent."""
    d = load(spark, sf_dir, "documents")
    w = d.select("doc_id", F.explode(words_of()).alias("word"))
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfq = w.groupBy("word").agg(F.countDistinct("doc_id").alias("dfc"))
    nd = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfq, on="word")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("dfc")), 6
            ).alias("tfidf"),
        )
    )


@register(
    "j7_lang_source_profile",
    oracle="""
SELECT lang, source, COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 4) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang, source
""",
)
def j7_lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j7: corpus profiling — docs and length stats per lang × source."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "j13_lang_id_heuristic",
    oracle="""
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
            WHEN regexp_matches(lower(text), '[äöüß]') THEN 'de'
            WHEN regexp_matches(lower(text), '[ñ¿¡]') THEN 'es'
            WHEN regexp_matches(lower(text), '[àâçèêî]') THEN 'fr'
            WHEN regexp_matches(text, '^[ -~]+$') THEN 'en'
            ELSE 'und' END AS lang_pred
FROM documents
""",
)
def j13_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: script/diacritic marker classes with an
    ASCII fallback — table-driven CASE ladder, trivially extendable.
    (Real-world accuracy needs char-n-gram profiles; the operator shape
    — pure native regexp CASE — is the 100 TB-relevant part.)

    Delegates to ``lang_id``."""
    d = load(spark, sf_dir, "documents")
    return lang_id(d)


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """j13's engine: script/diacritic-marker language ID over any
    (doc_id, text) DataFrame — returns (doc_id, lang_pred)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.when(t.rlike("[一-鿿]"), "zh")
        .when(F.lower(t).rlike("[äöüß]"), "de")
        .when(F.lower(t).rlike("[ñ¿¡]"), "es")
        .when(F.lower(t).rlike("[àâçèêî]"), "fr")
        .when(t.rlike("^[ -~]+$"), "en")
        .otherwise("und")
        .alias("lang_pred"),
    )


_STOPWORDS = ("a", "the", "of", "and", "in", "to", "is", "on")


@register(
    "j14_text_quality_score",
    oracle=f"""
SELECT doc_id, n_words, n_chars,
       ROUND(avg_word_len, 4) AS avg_word_len,
       ROUND(stop_frac, 6) AS stop_frac,
       ROUND(1.0 / (1.0 + exp(-(0.05 * n_words - 2.0))), 6) AS length_score
FROM (
  SELECT doc_id, n_chars,
         len(string_split(lower(text), ' ')) AS n_words,
         CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS avg_word_len,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN {_STOPWORDS!r})) AS DOUBLE)
           / len(string_split(lower(text), ' ')) AS stop_frac
  FROM documents
)
""",
)
def j14_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: word/char counts, average word length, stopword
    ratio, and a logistic length score — the standard pre-training
    corpus filters, all as native expressions.

    Delegates to ``text_quality_score``."""
    d = load(spark, sf_dir, "documents")
    return text_quality_score(d, stopwords=_STOPWORDS)


def text_quality_score(docs: DataFrame, stopwords=_STOPWORDS) -> DataFrame:
    """j14's engine, parameterized: per-doc word/char counts, average
    word length, stopword ratio over ``stopwords``, and a logistic
    length score — pure row-local expressions.  Works on any
    (doc_id, text) DataFrame: n_chars is computed from the text when
    the caller's table doesn't already carry it."""
    if "n_chars" not in docs.columns:
        docs = docs.withColumn("n_chars", F.length("text").cast("long"))
    w = words_of()
    n_words = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    stop_frac = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast(
        "double"
    ) / n_words
    avg_word_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        "n_chars",
        F.round(avg_word_len, 4).alias("avg_word_len"),
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(1.0 / (1.0 + F.exp(-(0.05 * n_words.cast("double") - 2.0))), 6).alias(
            "length_score"
        ),
    )


@register(
    "j15_token_count",
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / 4) AS BIGINT) AS bpe_est_tokens
FROM documents
""",
)
def j15_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + the chars/4 BPE estimate
    (the standard quick sizing heuristic for LLM token budgets).

    Delegates to ``token_counts``."""
    d = load(spark, sf_dir, "documents")
    return token_counts(d)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """j15's engine: per-doc whitespace token count + chars/4 BPE
    estimate over any (doc_id, text) DataFrame."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("ws_tokens"),
        F.ceil(F.length(text_col).cast("double") / 4).alias("bpe_est_tokens"),
    )


@register(
    "j18_sample_hash",
    oracle="""
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'test'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'val'
            ELSE 'train' END AS split
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
""",
)
def j18_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based sampling + train/val/test split — the
    reproducible-pipeline alternative to rand() sampling (engine RNGs
    differ; md5 doesn't).  Hex-prefix thresholds: keep ~75% ('0'..'b'
    of 16), then split ~5%/5%/rest by the first byte.  Same row lands
    in the same split on every engine, every run, every cluster size."""
    d = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        d.filter(F.substring(h, 1, 1) < "c")
        .select(
            "doc_id",
            "lang",
            F.when(F.substring(h, 1, 2) < "0d", "test")
            .when(F.substring(h, 1, 2) < "1a", "val")
            .otherwise("train")
            .alias("split"),
        )
    )


@register(
    "j19_stratified_sample",
    oracle="""
SELECT lang, COUNT(*) AS n_sampled
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      CASE WHEN lang = 'en' THEN '1a' ELSE '80' END
GROUP BY lang
""",
)
def j19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-class) deterministic sampling: ~10% of 'en' docs,
    ~50% of everything else — the class-rebalancing shape for training
    mixes, as a pure map-side predicate (no shuffle, no RNG)."""
    d = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    bound = F.when(F.col("lang") == "en", "1a").otherwise("80")
    return d.filter(h2 < bound).groupBy("lang").agg(F.count("*").alias("n_sampled"))


@register(
    "j16_fingerprint",
    oracle="""
SELECT doc_id,
       array_to_string(list_sort(list_transform(
         list_distinct(list_transform(range(len(w) - 2),
                                      i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])),
         g -> md5(g)))[1:4], ',') AS fingerprint
FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
""",
)
def j16_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: bottom-4 sketch of md5'd word-3-gram
    shingles (a deterministic min-k sketch — two docs share fingerprint
    entries iff they share shingles; engine-portable because it stays
    in hex-string space).  Serialized ','-joined — oracle-checked
    projections must stay ARRAY-free (driver hasher)."""
    d = load(spark, sf_dir, "documents")
    fp = F.slice(
        F.array_sort(F.transform(word_shingles("text", 3), lambda g: F.md5(g))), 1, 4
    )
    return d.select("doc_id", F.array_join(fp, ",").alias("fingerprint"))


_RK_K, _RK_B, _RK_M, _RK_W = 8, 257, 2147483647, 4

# Rolling-hash sequence shared by j16b/j16c: polynomial hash of every
# char-K-gram of column `t`, as a Spark SQL fragment (codegen'd nested
# transform/aggregate — no Python) and its DuckDB list_reduce twin.
_RK_HASHES_SPARK = f"""transform(
  CASE WHEN length(t) >= {_RK_K} THEN sequence(1, length(t) - {_RK_K} + 1)
       ELSE array() END,
  i -> aggregate(sequence(0, {_RK_K - 1}), 0L,
                 (acc, j) -> (acc * {_RK_B} + ascii(substring(t, i + j, 1))) % {_RK_M}))"""
# Winnowing selection over a hash-list column `h` (min of each window of
# W consecutive hashes, deduplicated) — shared by j16c and its tests.
_RK_WINNOW_SPARK = f"""array_sort(array_distinct(transform(
  CASE WHEN size(h) >= {_RK_W} THEN sequence(1, size(h) - {_RK_W} + 1)
       ELSE array() END,
  i -> array_min(slice(h, i, {_RK_W})))))"""
_RK_HASHES_DUCK = f"""list_transform(
    range(1, CASE WHEN length(t) >= {_RK_K} THEN length(t) - {_RK_K} + 2 ELSE 1 END),
    i -> list_reduce(
           list_prepend(0::BIGINT,
                        list_transform(range(0, {_RK_K}),
                                       j -> ascii(substr(t, i + j, 1))::BIGINT)),
           (acc, c) -> (acc * {_RK_B} + c) % {_RK_M}))"""


@register(
    "j16b_fingerprint_rolling",
    oracle=f"""
SELECT doc_id,
  array_to_string(list_transform(list_sort(list_distinct({_RK_HASHES_DUCK}))[1:4],
                                 x -> x::VARCHAR), ',') AS fingerprint
FROM (SELECT doc_id, lower(text) AS t FROM documents)
""",
)
def j16b_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting, Rabin-Karp family: bottom-4 sketch of
    polynomial hashes (base 257 mod 2^31-1) of every char-8-gram —
    robust to word-boundary edits where j16's word shingles are not.
    Expressed declaratively as a nested transform/aggregate fold
    (codegen, no Python); a streaming producer would roll the same hash
    incrementally in O(1) per char.  Int64 stays exact: acc < 2^31 so
    acc*257 + c < 2^40."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    fp = F.expr(
        "array_join(transform("
        f"slice(array_sort(array_distinct({_RK_HASHES_SPARK})), 1, 4), "
        "x -> cast(x as string)), ',')"
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "j16c_fingerprint_winnow",
    oracle=f"""
SELECT doc_id, array_to_string(list_transform(list_sort(list_distinct(list_transform(
    range(1, CASE WHEN len(h) >= {_RK_W} THEN len(h) - {_RK_W} + 2 ELSE 1 END),
    i -> list_min(h[i:i+{_RK_W}-1])))), x -> x::VARCHAR), ',') AS fingerprint
FROM (SELECT doc_id, {_RK_HASHES_DUCK} AS h
      FROM (SELECT doc_id, lower(text) AS t FROM documents))
""",
)
def j16c_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting, full winnowing (Schleimer/Wilkerson/
    Aiken, SIGMOD 2003 — the MOSS algorithm): the minimum of every
    window of W=4 consecutive char-8-gram rolling hashes, deduplicated.
    Guarantees every match of length >= K + W - 1 chars between two
    docs shares a selected hash, with fingerprint density ~2/(W+1) —
    position-robust where bottom-k (j16/j16b) is content-global.
    Declarative end to end: the hash list and its windowed minima are
    nested transform/array_min expressions (codegen, no Python)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    fp = F.expr(
        f"array_join(transform({_RK_WINNOW_SPARK}, x -> cast(x as string)), ',')"
    )
    return (
        d.withColumn("h", F.expr(_RK_HASHES_SPARK))
        .select("doc_id", fp.alias("fingerprint"))
    )


@register(
    "j22_heavy_hitters",
    oracle="""
SELECT word, COUNT(*) AS cnt,
       ROUND(COUNT(*) / (SELECT COUNT(*) FROM (
         SELECT unnest(string_split(lower(text), ' ')) FROM documents)), 6) AS share
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
GROUP BY word
HAVING COUNT(*) >= 0.005 * (SELECT COUNT(*) FROM (
         SELECT unnest(string_split(lower(text), ' ')) FROM documents))
""",
)
def j22_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j22: heavy hitters — terms with >= 0.5% corpus support, with
    their support share (corpus profiling / stopword discovery).  The
    total is a 1-row aggregate broadcast into the filter, so the plan
    is scan → partial/final count per term → broadcast-joined HAVING:
    no second corpus pass, no driver-side scalar.  At 100 TB the same
    shape holds; if the term dictionary itself outgrows memory, swap
    the exact groupBy for a space-saving sketch per partition merged by
    key (the counts stay exact for everything above the threshold)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(words_of()).alias("word"))
    counts = toks.groupBy("word").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__n"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") >= 0.005 * F.col("__n"))
        .select(
            "word", "cnt", F.round(F.col("cnt") / F.col("__n"), 6).alias("share")
        )
    )


@register(
    "j36_countmin_sketch",
    oracle="""
WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
cells AS (
  SELECT r,
         (('0x' || substr(md5('cm' || r || '|' || word), 1, 15))::BIGINT
          % 2147483647) % 256 AS b,
         COUNT(*) AS cell
  FROM w, (SELECT unnest(range(4)) AS r) rs
  GROUP BY 1, 2
),
exact AS (
  SELECT word, COUNT(*) AS exact_n FROM w GROUP BY word
  ORDER BY exact_n DESC, word LIMIT 20
),
est AS (
  SELECT e.word, MIN(c.cell) AS est_n
  FROM exact e JOIN cells c
    ON c.b = (('0x' || substr(md5('cm' || c.r || '|' || e.word), 1, 15))::BIGINT
              % 2147483647) % 256
  GROUP BY e.word
)
SELECT e.word, exact_n, CAST(est_n AS BIGINT) AS est_n,
       CAST(est_n - exact_n AS BIGINT) AS overestimate
FROM exact e JOIN est USING (word)
""",
)
def j36_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j36 (extension): Count-Min sketch (Cormode & Muthukrishnan 2005)
    over the corpus term stream — a 4×256 table of bucket counts whose
    MIN across rows upper-bounds any term's true frequency.  The sketch
    is built as ONE partial-aggregated groupBy over (row, bucket) — a
    fixed ≤1024-cell table no matter the corpus size, which is the
    whole point at 100 TB: heavy-hitter estimation with O(1) memory and
    mergeable per-partition sketches (cell-wise sum), where j22's exact
    groupBy must carry the full term dictionary.  Released here: the
    exact top-20 terms with their sketch estimates and the (always ≥ 0)
    collision overestimate, so the error is published with the sketch.
    Hashes are md5-derived (hash31_md5 discipline), so the oracle
    rebuilds the identical sketch."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(words_of()).alias("word"))

    def bucket(r, word_col):
        return hash31_md5(F.concat(F.lit(f"cm{r}|"), word_col)) % 256

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"), bucket(r, F.col("word")).alias("b")
                        )
                        for r in range(4)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    exact = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "word")
        .limit(20)
    )
    probes = exact.select(
        "word",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("pr"), bucket(r, F.col("word")).alias("pb")
                    )
                    for r in range(4)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            F.broadcast(cells),
            (F.col("p.pr") == F.col("r")) & (F.col("p.pb") == F.col("b")),
        )
        .groupBy("word", "exact_n")
        .agg(F.min("cell").alias("est_n"))
    )
    return est.select(
        "word",
        "exact_n",
        F.col("est_n").cast("long").alias("est_n"),
        (F.col("est_n") - F.col("exact_n")).cast("long").alias("overestimate"),
    )


def connected_components(
    edges: DataFrame, max_iter: int = 50, stats: dict | None = None
) -> DataFrame:
    """Connected components by min-label propagation: every node starts
    as its own component; each round a node adopts the smallest
    component id among itself and its neighbours, until a round changes
    nothing.  Rounds = graph diameter (near-dup graphs are shallow —
    clusters of rewrites of one source), each round is one self-join +
    groupBy-min on the EDGE list, never the corpus; lineage is cut per
    round (localCheckpoint; reliable checkpoint on a real cluster)
    exactly like the Mondrian driver loop.

    Raises RuntimeError if ``max_iter`` rounds pass without reaching
    the fixpoint — partially-propagated labels are WRONG answers
    (components silently split), so exhaustion is an error, never a
    release (the kmeans_fit_converged convention: convergence is part
    of the contract, not a hope).  For high-diameter graphs where
    diameter-many rounds are the real cost, use
    ``connected_components_altstar`` (O(log²) rounds) instead.

    ``edges`` must have columns (a, b); returns (node, component) with
    component = min node id reachable.  If ``stats`` is given, the
    number of propagation rounds used is recorded under
    ``stats["rounds"]``."""
    # Materialize the edge list ONCE before iterating: `edges` may be an
    # arbitrarily expensive upstream DAG (j23 hands in the whole LSH
    # dedup pipeline), and without this cut every propagation round —
    # and both sides of its self-join — would recompute it from scratch.
    edges = edges.localCheckpoint(eager=True)
    sym = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # Round 13 (guide §2.4, the p1b edge-checkpoint discipline): pin the
    # propagation join's big side to the join key's partitioning once —
    # LAZY checkpoint, so the hash(v) table materializes with round 1's
    # job (it reads the already-checkpointed edges; no dedicated job).
    # Each round then pays ONE exchange (the groupBy-u transpose); the
    # label table inherits hash(node) from its own round join, so
    # neither join side re-exchanges per round.
    sym = sym.repartition("v").localCheckpoint(eager=False)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    converged = False
    rounds = 0
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nc"))
        )
        updated = (
            labels.join(neigh, labels.node == neigh.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nc"), F.col("component"))
                ).alias("component"),
                (F.col("nc") < F.col("component")).alias("__chg"),
            )
        )
        # Lazy checkpoint + FULL count: one job both materializes the
        # round's label table (every partition — count() has no
        # limit-style short-circuit, so nothing is left for
        # doCheckpoint's supplemental job) and answers the convergence
        # probe, where the eager-checkpoint + limit(1).count() pair
        # paid a second scheduler round-trip per propagation round.
        updated = updated.localCheckpoint(eager=False)
        changed = updated.filter(F.col("__chg")).count()
        labels = updated.drop("__chg")
        rounds += 1
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach fixpoint in {max_iter} rounds "
            "(graph diameter exceeds the round budget); raise max_iter or use "
            "connected_components_altstar for high-diameter graphs"
        )
    return labels


def connected_components_altstar(
    edges: DataFrame, max_iter: int = 50, stats: dict | None = None
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
    Components in MapReduce and Beyond", SoCC 2014) — the log-round
    complement to ``connected_components``: min-label propagation
    needs rounds = component diameter, while the alternating star
    operations contract every component onto its minimum node in
    O(log² n) rounds (O(log n) in practice), because each large-star
    HALVES the height of every tree in the hooking forest rather than
    shrinking it by one level.

    One round, two edge-list passes (both are one groupBy-min + one
    re-join of the edge list — no collect_list, so a giant star's
    center never materializes its neighbor array on one task):

    - large-star: for each node u, every STRICTLY LARGER neighbor
      v > u re-hooks to m(u) = min(Γ(u) ∪ {u});
    - small-star: orienting edges large→small, every smaller-or-self
      node in N(u) ∪ {u} re-hooks to m = min(N(u) ∪ {u}).

    The fixpoint is a star forest (every edge points node → component
    min); labels are read directly off the final edge list.  Raises
    RuntimeError on round exhaustion (same contract as
    ``connected_components``): a non-star edge list is not an answer.

    Scale: each pass is one shuffle of the EDGE list keyed by node —
    the same join shape as min-label propagation, but the round count
    is log-bounded instead of diameter-bounded, which is the 100×
    story for long-path graphs (web graphs, retweet chains, road
    networks).  Per-round localCheckpoint cuts lineage; use reliable
    checkpoint on a real cluster.

    ``edges``: columns (a, b); returns (node, component)."""
    e = (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Invariant maintained below: every stored edge is (hi, lo) with
    # hi > lo — "hi currently hooks to lo".  Both star passes preserve
    # it (they only ever hook a node to something strictly smaller
    # than one of its current neighbors or itself).
    cur = e.select(F.col("v").alias("hi"), F.col("u").alias("lo"))
    n_cur = cur.count()  # carried across rounds (the kcore convention)
    converged = False
    rounds = 0
    for _ in range(max_iter):
        # --- large-star: u's neighbors v > u hook to min(Γ(u) ∪ {u}).
        sym = cur.select(F.col("hi").alias("n"), F.col("lo").alias("nb")).unionByName(
            cur.select(F.col("lo").alias("n"), F.col("hi").alias("nb"))
        )
        m = sym.groupBy("n").agg(
            # min over the group-constant n == n itself; min is the
            # order-insensitive way to reference it inside the agg.
            F.least(F.min("nb"), F.min("n")).alias("m")
        )
        big = (
            sym.filter(F.col("nb") > F.col("n"))
            .join(m, "n")
            .select(F.col("nb").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # --- small-star on the large-star output: edges are already
        # oriented hi → lo; every lo-side neighbor of u (and u itself)
        # hooks to min(N(u) ∪ {u}) = min over u's lo-side neighbors.
        nm = big.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            big.join(nm, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(nm.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            # Lazy: the count() below materializes every partition in
            # the same job (see connected_components — one scheduler
            # round-trip per pass instead of two).
            .localCheckpoint(eager=False)
        )
        rounds += 1
        # Fixpoint ⇔ the (distinct, canonically oriented) edge set is
        # unchanged: equal cardinality + empty one-sided difference.
        # The previous round's cardinality is CARRIED (n_cur), not
        # recounted — it is deterministic and already paid for.
        n_small = small.count()
        if (
            n_small == n_cur
            and small.subtract(cur).limit(1).count() == 0
        ):
            converged = True
            cur = small
            break
        cur, n_cur = small, n_small
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components_altstar did not reach a star forest in "
            f"{max_iter} rounds; raise max_iter"
        )
    # Star forest: every edge is node → its component min; roots (the
    # mins themselves) appear only on the lo side.
    leaves = cur.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = (
        cur.select(F.col("lo").alias("node"))
        .distinct()
        .join(leaves.select(F.col("node")), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return leaves.unionByName(roots)


# j23's oracle: min-label propagation with a FIXED round budget instead
# of a recursive CTE.  An unbounded transitive-closure recursion
# re-evaluates the (expensive) inlined pair CTE once per iteration AND
# its row count is Θ(Σ|component|²) — it wedged for minutes at sf0.1
# Exact transitive closure via recursive CTE — corpus-independent,
# unlike a fixed number of label-propagation rounds whose correctness
# depends on component diameter (round-4 review finding; j24 and j25
# use the same closure form).
def _j23_oracle() -> str:
    return f"""WITH RECURSIVE
jacc AS MATERIALIZED (SELECT a_id, b_id FROM ({_J3_ORACLE}) j3),
edges AS MATERIALIZED (SELECT a_id AS u, b_id AS v FROM jacc
                       UNION ALL SELECT b_id, a_id FROM jacc),
reach AS (
  SELECT u AS node, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v AS node, reach.r FROM reach JOIN edges e ON e.u = reach.node
),
comp AS (SELECT node, MIN(r) AS c FROM reach GROUP BY node)
SELECT c AS component, node AS doc_id,
       COUNT(*) OVER (PARTITION BY c) AS cluster_size,
       node = c AS is_survivor
FROM comp
"""


@register("j23_dedup_clusters", oracle=_j23_oracle())
def j23_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j23: near-duplicate CLUSTERS — the step after pair generation
    that dedup actually needs: connected components over the verified
    pair graph of the PRODUCTION dedup path (j3 MinHash-LSH: planted
    3-gram corpus, exact-Jaccard-verified candidates), one survivor
    (min doc_id) per component.  Returns (component, doc_id,
    cluster_size, is_survivor); property tests pin transitive chains
    (a-b, b-c, c-d → one 4-cluster) and the planted corpus.

    j23 originally clustered the exhaustive j3c graph (2-gram τ 0.2);
    that pair join is Θ(Σ df²) over a tiny shared vocabulary — ~73M
    intermediate rows at sf0.1, an OOM in a default local session and
    the wrong input for clustering at any real scale.  j3c remains the
    standalone exhaustive baseline; clustering consumes the bounded
    LSH pipeline."""
    from pyspark.sql import Window

    pairs = j3_dedup_near_minhash(spark, sf_dir).select(
        F.col("a_id").alias("a"), F.col("b_id").alias("b")
    )
    comp = connected_components(pairs)
    w = F.count("*").over(Window.partitionBy("component"))
    return (
        comp.withColumn("cluster_size", w)
        .select(
            "component",
            F.col("node").alias("doc_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_survivor"),
        )
    )


def cluster_canonical(
    comp: DataFrame, corpus: DataFrame, stopwords=_STOPWORDS
) -> DataFrame:
    """j62's engine: QUALITY-AWARE canonical selection per near-dup
    cluster.  ``comp`` carries (component, doc_id) — j23's connected
    components over the verified pair graph; ``corpus`` carries
    (doc_id, text).  j23/j37's survivor rule is lowest-id — fine for
    determinism, blind to quality; production dedup keeps the BEST
    member of each cluster (CCNet keeps by perplexity, SemDeDup by
    centroid distance).  Here the quality key is the stopword fraction
    (Gopher/C4's naturalness signal, j14's stop_frac): canonical =
    argmax stop_cnt/n_words, ties to the lower doc_id.

    Cross-engine exactness: stop_cnt and n_words are exact integers;
    the ordering key is their one-division double (identical IEEE
    operands both engines), ties broken by doc_id — the same
    double-ordering discipline as every cos_sim ranking.  Release:
    (component, doc_id, n_words, stop_cnt, is_canonical).

    Plan shape: quality is one row-local projection over the corpus;
    the join to components is id-keyed; the argmax is ONE window
    partitioned by component — no pair join, nothing global."""
    from pyspark.sql import Window

    low = F.split(F.lower(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    q = corpus.select(
        "doc_id",
        F.size(low).cast("long").alias("n_words"),
        F.size(F.filter(low, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("stop_cnt"),
    )
    w = Window.partitionBy("component").orderBy(
        (F.col("stop_cnt").cast("double") / F.col("n_words")).desc(),
        F.col("doc_id").asc(),
    )
    return (
        comp.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "component",
            "doc_id",
            "n_words",
            "stop_cnt",
            (F.col("rn") == 1).alias("is_canonical"),
        )
    )


def _j62_oracle() -> str:
    return f"""
WITH comp AS (SELECT component, doc_id FROM ({_j23_oracle()}) j23),
corpus2 AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         substring(lower(text), instr(lower(text), ' ') + 1)
  FROM documents),
q62 AS (SELECT doc_id,
               CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_filter(string_split(t, ' '),
                                    w -> w IN {_STOPWORDS!r})) AS BIGINT)
                 AS stop_cnt
        FROM corpus2)
SELECT component, doc_id, n_words, stop_cnt,
       ROW_NUMBER() OVER (PARTITION BY component
                          ORDER BY stop_cnt::DOUBLE / n_words DESC,
                                   doc_id ASC) = 1 AS is_canonical
FROM comp JOIN q62 USING (doc_id)
"""


@register("j62_cluster_canonical", oracle=_j62_oracle())
def j62_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j62 (extension): quality-aware survivor selection over j23's
    near-dup clusters — canonical = highest stopword fraction (the
    naturalness quality key), ties to the lower id; the production
    refinement of j23/j37's lowest-id rule (CCNet keeps by model
    score; this is the model-free analogue).  Delegates to
    ``cluster_canonical``."""
    comp = j23_dedup_clusters(spark, sf_dir).select("component", "doc_id")
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    return cluster_canonical(comp, corpus)


def _j37_oracle() -> str:
    return f"""
SELECT d.doc_id, md5(d.text) AS content_hash, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN (
  SELECT doc_id FROM ({_j23_oracle()}) j23 WHERE NOT is_survivor
)
"""


@register("j37_dedup_materialize", oracle=_j37_oracle())
def j37_dedup_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j37 (extension): the MATERIALIZED deduplicated corpus — what a
    user actually writes back out after near-dup analysis: the
    documents table minus every non-survivor of the j23 cluster pass
    (min-id survivor per connected component of the verified MinHash
    pair graph).  j23/j24 report the structure and the counts; this is
    the corpus itself, projected to (doc_id, content_hash, n_chars) so
    the release is hash-checkable without shipping text through the
    comparison harness.

    Scale: one left-anti join of the corpus against the (tiny)
    non-survivor id set — broadcast at any realistic dedup rate; the
    cost is the j23 pipeline it consumes (cached per session)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    drop = (
        j23_dedup_clusters(spark, sf_dir)
        .filter(~F.col("is_survivor"))
        .select("doc_id")
    )
    return d.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", F.md5("text").alias("content_hash"), "n_chars"
    )


# --- j24: the end-to-end training-data funnel -----------------------------

_J24_STAGES_SQL = """
WITH RECURSIVE
base AS (SELECT doc_id, text, lang FROM documents),
raw AS (
  SELECT doc_id, text, lang FROM base
  UNION ALL SELECT doc_id + 200000, text, lang FROM base
  UNION ALL SELECT doc_id + 100000,
                   substring(text, instr(text, ' ') + 1), lang FROM base
),
quality AS (SELECT * FROM raw WHERE len(string_split(lower(text), ' ')) >= 30),
langf AS (SELECT * FROM quality WHERE lang = 'en'),
exactd AS (
  SELECT doc_id, text, lang FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM langf)
  WHERE doc_id = keep
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(w) - 2, 1) + 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM exactd)
),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
shared AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS shared
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
nsz AS (SELECT doc_id, len(s) AS n FROM sh),
pairs AS (
  SELECT a_id, b_id FROM shared
  JOIN nsz na ON na.doc_id = a_id JOIN nsz nb ON nb.doc_id = b_id
  WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.5
),
edges AS (SELECT a_id AS u, b_id AS v FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs),
reach AS (
  SELECT u AS node, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v AS node, reach.r FROM reach JOIN edges e ON e.u = reach.node
),
nond AS (
  SELECT node AS doc_id FROM (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
  WHERE node <> component
),
neard AS (SELECT * FROM exactd WHERE doc_id NOT IN (SELECT doc_id FROM nond))
"""

_J24_ORACLE = _J24_STAGES_SQL + "\n" + "\nUNION ALL\n".join(
    f"SELECT '{name}' AS stage, COUNT(*) AS n_docs,\n"
    f"       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)"
    f" AS n_ws_tokens FROM {cte}"
    for name, cte in [
        ("1_raw", "raw"), ("2_quality", "quality"), ("3_lang", "langf"),
        ("4_exact_dedup", "exactd"), ("5_near_dedup", "neard"),
    ]
)


def _j24_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's stage-1..4 survival flags (q/l/e per doc over the
    planted 3× corpus), persisted per (session, sf_dir) — shared by j24
    and j24b so the driver pays the scan once."""
    from pyspark.sql import Window

    key = (spark.sparkContext.applicationId, sf_dir, "j24_flags")
    flags = _J3_SHINGLE_CACHE.get(key)
    if flags is None:
        d = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
        exact_copy = d.select((F.col("doc_id") + 200000).alias("doc_id"), "text", "lang")
        pert_copy = d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
            "lang",
        )
        raw = d.unionByName(exact_copy).unionByName(pert_copy)

        n_words = F.size(F.split(F.lower(F.col("text")), " "))
        w_hash = Window.partitionBy(F.md5("text"))
        flags = (
            raw.withColumn("q", n_words >= 30)
            .withColumn("l", F.col("q") & (F.col("lang") == "en"))
            # min doc_id among lang-surviving copies of this content; a
            # doc survives exact dedup iff it is that minimum.
            .withColumn(
                "e",
                F.col("l")
                & (
                    F.min(F.when(F.col("l"), F.col("doc_id"))).over(w_hash)
                    == F.col("doc_id")
                ),
            )
            .persist()
        )
        cache_put(_J3_SHINGLE_CACHE, key, flags)
    return flags


def _j24_non_survivors(spark: SparkSession, sf_dir: str, flags: DataFrame) -> DataFrame:
    """Near-dup non-survivors among exact-dedup survivors: exhaustive
    inverted-index 3-gram Jaccard ≥ 0.5 pairs → connected components →
    everything but each component's min-id.  Cached per (session,
    sf_dir) like the flags — j24 and j24b both consume it, and the pair
    join is the funnel's most expensive stage."""
    key = (spark.sparkContext.applicationId, sf_dir, "j24_nondup")
    cached = _J3_SHINGLE_CACHE.get(key)
    if cached is not None:
        return cached
    exactd = flags.filter(F.col("e"))
    sh = exactd.select("doc_id", word_shingles("text", 3).alias("s"))
    inv = sh.select("doc_id", F.explode("s").alias("g"))
    shared = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("shared"))
    )
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    pairs = (
        shared.join(
            sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na")), "a_id"
        )
        .join(sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb")), "b_id")
        .filter(
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")) >= 0.5
        )
        .select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    )
    out = (
        connected_components(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"), F.lit(True).alias("__dup"))
        .persist()
    )
    cache_put(_J3_SHINGLE_CACHE, key, out)
    return out


@register("j24_training_funnel", oracle=_J24_ORACLE)
def j24_training_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j24: the END-TO-END training-data curation funnel as ONE lazy
    plan — quality filter → language filter → exact dedup → near-dup
    dedup — reporting (docs, whitespace tokens) surviving each stage.
    The corpus plants one exact copy (doc_id+200000) and one perturbed
    copy (doc_id+100000, first word dropped) per document, so every
    stage provably removes something: short docs fail the n_words ≥ 30
    gate, non-'en' docs the language gate, planted copies the md5
    min-id dedup, and perturbed twins the exact-Jaccard (3-gram ≥ 0.5)
    connected-components dedup, which keeps only each cluster's min-id
    survivor.  The oracle replays the identical funnel in DuckDB
    (recursive CTE for the components), so all five stage counts and
    token totals are hash-checked.

    100 TB shape: stages 1-3 are map-side predicates folded into ONE
    scan as per-doc survival flags (no per-stage recompute); exact
    dedup is one hash-partitioned window on the content hash; the pair
    graph comes from an inverted shingle index (shuffle on shingle,
    never docs²) — swap in the j3 MinHash bands when even the index is
    too hot; components iterate over the EDGE list only, and the final
    report is a single conditional aggregation unpivoted to funnel
    rows."""
    flags = _j24_flags(spark, sf_dir)
    non_survivors = _j24_non_survivors(spark, sf_dir, flags)

    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    doc = (
        flags.join(non_survivors, "doc_id", "left")
        .withColumn("n", F.col("e") & F.col("__dup").isNull())
        .withColumn("__ws", ws_tokens)
    )
    wide = doc.agg(
        F.count("*").alias("c1"),
        F.sum("__ws").alias("t1"),
        F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("q"), F.col("__ws"))).alias("t2"),
        F.sum(F.when(F.col("l"), 1).otherwise(0)).alias("c3"),
        F.sum(F.when(F.col("l"), F.col("__ws"))).alias("t3"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).alias("c4"),
        F.sum(F.when(F.col("e"), F.col("__ws"))).alias("t4"),
        F.sum(F.when(F.col("n"), 1).otherwise(0)).alias("c5"),
        F.sum(F.when(F.col("n"), F.col("__ws"))).alias("t5"),
    )
    return wide.selectExpr(
        "stack(5, '1_raw', c1, t1, '2_quality', c2, t2, '3_lang', c3, t3, "
        "'4_exact_dedup', c4, t4, '5_near_dedup', c5, t5) "
        "AS (stage, n_docs, n_ws_tokens)"
    )


# ---------------------------------------------------------------------------
# PII scrubbing over free text (i26/i27 extensions) — the anonymization
# engine's text-side counterpart to the i-family column operators: LLM
# training corpora must have direct identifiers scrubbed from the text
# itself, not just from relational columns.
# ---------------------------------------------------------------------------

# (name, pattern, replacement) — patterns restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): literal
# classes, bounded repetition, no backrefs/lookaround.  Email first so
# the ip pattern can never nibble at a domain.
_PII_RULES = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\+1-555-[0-9]{4}", "<PHONE>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
]

# Deterministic PII injection, replayed identically by the oracle: the
# corpus is digit-free word salad (FIXTURES.md), so every match in the
# derived text is an injected identifier.  Every doc gets an email +
# phone; doc_id % 3 == 0 adds an SSN, doc_id % 5 == 0 a second email,
# doc_id % 4 == 0 an IP — so per-type counts vary per doc and the
# profile aggregates are non-trivial.
_PII_INJECT_SQL = """
text || ' contact user' || doc_id::VARCHAR || '@mail.example.com phone +1-555-'
     || (1000 + doc_id % 9000)::VARCHAR
     || CASE WHEN doc_id % 3 = 0
             THEN ' ssn ' || (100 + doc_id % 900)::VARCHAR || '-'
                  || (10 + doc_id % 90)::VARCHAR || '-'
                  || (1000 + doc_id % 7000)::VARCHAR
             ELSE '' END
     || CASE WHEN doc_id % 5 = 0
             THEN ' cc admin' || doc_id::VARCHAR || '@corp.example.org'
             ELSE '' END
     || CASE WHEN doc_id % 4 = 0
             THEN ' ip ' || (1 + doc_id % 254)::VARCHAR || '.0.'
                  || (doc_id % 254)::VARCHAR || '.7'
             ELSE '' END
"""


def _pii_inject_col() -> Column:
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), s(did), F.lit("@mail.example.com phone +1-555-"),
        s(F.lit(1000) + did % 9000),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" ssn "), s(F.lit(100) + did % 900), F.lit("-"),
                     s(F.lit(10) + did % 90), F.lit("-"),
                     s(F.lit(1000) + did % 7000)),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" cc admin"), s(did), F.lit("@corp.example.org")),
        ).otherwise(""),
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" ip "), s(F.lit(1) + did % 254), F.lit(".0."),
                     s(did % 254), F.lit(".7")),
        ).otherwise(""),
    )


def scrub_pii(col: Column) -> Column:
    """Chained regexp_replace over the rule table — one projection,
    whole-stage-codegen'd; the 100 TB cost is a single map-side pass."""
    out = col
    for _, pat, repl in _PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def _i26_sql_counts() -> str:
    return ", ".join(
        f"len(regexp_extract_all(pii_text, '{pat}')) AS n_{name}"
        for name, pat, _ in _PII_RULES
    )


def _i26_sql_clean() -> str:
    clean = "pii_text"
    for _, pat, repl in _PII_RULES:
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return clean


_I26_ORACLE = f"""
WITH pii AS (SELECT doc_id, source, {_PII_INJECT_SQL} AS pii_text FROM documents)
SELECT doc_id, source, {_i26_sql_clean()} AS clean_text, {_i26_sql_counts()}
FROM pii
"""


def pii_scrub_projection(d: DataFrame) -> DataFrame:
    """The ONE scrub projection shared by batch i26 and streaming k14
    (k14 shares i26's oracle row-for-row, so the projection must be a
    single definition — an inline copy in k14 was a drift hazard,
    round-4 review finding): inject deterministic PII, emit the
    scrubbed text plus per-rule counts over the raw text."""
    pii = d.select("doc_id", "source", _pii_inject_col().alias("pii_text"))
    return pii.select(
        "doc_id",
        "source",
        scrub_pii(F.col("pii_text")).alias("clean_text"),
        *[
            F.regexp_count("pii_text", F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in _PII_RULES
        ],
    )


@register("i26_pii_scrub_text", oracle=_I26_ORACLE)
def i26_pii_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i26 (extension): free-text PII scrubbing — regex redaction of
    emails / phone numbers / SSNs / IPv4s, plus per-type match counts.
    The corpus is digit-free, so the query derives a PII-bearing text
    per doc (deterministic injection keyed on doc_id, replayed by the
    oracle) and must scrub every planted identifier; counts are taken
    BEFORE scrubbing, each pattern against the raw text.  All four
    rules compile into one chained-regexp_replace projection — a pure
    map-side pass with no shuffle at any scale."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return pii_scrub_projection(d)


_I27_ORACLE = f"""
WITH pii AS (SELECT doc_id, source, {_PII_INJECT_SQL} AS pii_text FROM documents),
counted AS (SELECT doc_id, source, {_i26_sql_counts()} FROM pii)
SELECT source, COUNT(*) AS n_docs,
       SUM(n_email)::BIGINT AS total_email, SUM(n_phone)::BIGINT AS total_phone,
       SUM(n_ssn)::BIGINT AS total_ssn, SUM(n_ip)::BIGINT AS total_ip,
       SUM(CASE WHEN n_ssn + n_ip > 0 THEN 1 ELSE 0 END)::BIGINT AS docs_beyond_contact
FROM counted
GROUP BY source
"""


@register("i27_pii_profile", oracle=_I27_ORACLE)
def i27_pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i27 (extension): corpus PII risk profile per source — composes
    i26's count projection with a grouped rollup (which sources carry
    how much of which identifier class; the report an anonymization
    pass over a crawl corpus starts from).  Map-side partial counts →
    one small shuffle on source."""
    counted = i26_pii_scrub_text(spark, sf_dir)
    return counted.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_email").alias("total_email"),
        F.sum("n_phone").alias("total_phone"),
        F.sum("n_ssn").alias("total_ssn"),
        F.sum("n_ip").alias("total_ip"),
        F.sum(
            F.when(F.col("n_ssn") + F.col("n_ip") > 0, 1).otherwise(0)
        ).alias("docs_beyond_contact"),
    )


@register(
    "j26_segment_dedup",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
         array_to_string(w[(i*10+1):((i+1)*10)], ' ') AS seg
  FROM w, unnest(range(CAST(floor(len(w)/10) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs
)
SELECT doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx), ''))
         AS clean_hash
FROM ranked
GROUP BY doc_id
""",
)
def j26_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j26 (extension): segment-level exact dedup — the line-level pass
    of C4/RefinedWeb-style curation (Raffel 2020 §2.2; Penedo 2023),
    adapted to the newline-free corpus by segmenting each doc into
    consecutive 10-word chunks (the trailing <10-word remainder is out
    of scope by construction).  An occurrence survives iff it is the
    corpus-wide FIRST occurrence of its segment text in (doc_id,
    seg_idx) order; the cleaned doc is the ordered join of survivors,
    released as its md5 so the oracle row stays scalar.

    Scale: one explode to (doc, seg) rows, one shuffle partitioned BY
    SEGMENT TEXT for the first-occurrence window (exact-dedup shape —
    same key distribution as j1), one shuffle back by doc_id.  No
    driver-side state; segment ownership is decided inside the window,
    so the plan is 2-shuffle at any corpus size.

    Delegates to ``segment_dedup`` — the parameterized line/segment
    dedup a curation pipeline calls on its own corpus."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return segment_dedup(d, seg_words=10)


def segment_dedup(docs: DataFrame, seg_words: int = 10) -> DataFrame:
    """j26's engine, parameterized: segment ``docs`` (doc_id, text)
    into consecutive ``seg_words``-word chunks, keep only the
    corpus-wide FIRST occurrence of each segment text in (doc_id,
    seg_idx) order, and release per-doc accounting plus the md5 of the
    cleaned (survivor-joined) text."""
    words = F.split(F.col("text"), " ")
    nseg = F.floor(F.size(words) / seg_words).cast("long")
    segs = F.when(nseg > 0, F.sequence(F.lit(0).cast("long"), nseg - 1)).otherwise(
        F.array().cast("array<long>")
    )
    seg_rows = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                segs,
                lambda i: F.array_join(
                    F.slice(words, (i * seg_words + 1).cast("int"), seg_words), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    ).select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"), "seg")
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    )
    ranked = seg_rows.withColumn("rn", rn)
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("rn") == 1, F.struct("seg_idx", "seg"))
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            )
        ).alias("clean_hash"),
    )


@register(
    "j27_repetition_filter",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, len(w) AS n_words,
        list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS g2,
        list_max(list_transform(list_distinct(w),
                                d -> len(list_filter(w, x -> x = d)))) AS maxf
      FROM w)
SELECT doc_id, n_words,
       ROUND(1 - len(list_distinct(g2))::DOUBLE / len(g2), 6) AS dup_2gram_frac,
       ROUND(maxf::DOUBLE / n_words, 6) AS top_word_frac,
       (1 - len(list_distinct(g2))::DOUBLE / len(g2) <= 0.05
        AND maxf::DOUBLE / n_words <= 0.12) AS keep
FROM g
""",
)
def j27_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j27 (extension): within-document repetition quality signals —
    the Gopher repetition rules (Rae 2021 §A1.1) adapted to this
    corpus: fraction of duplicate word-2-grams and most-frequent-word
    dominance; a doc is kept iff both stay under threshold (0.05 /
    0.12 ≈ this corpus's p75/p85).

    Scale: every metric is a row-local array expression over the
    already-split word list — zero shuffle, zero Python, survives any
    corpus size as a pure map stage (like i26).  The top-word count is
    O(n·distinct) per row, bounded by document length, not corpus
    size.

    Delegates to ``repetition_signals`` with this corpus's p75/p85
    thresholds."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(d, dup2_max=0.05, top_max=0.12)


def repetition_signals(
    docs: DataFrame, dup2_max: float = 0.05, top_max: float = 0.12
) -> DataFrame:
    """j27's engine, parameterized: Gopher-style within-doc repetition
    metrics over ``docs`` (doc_id, text) — duplicate word-2-gram
    fraction and most-frequent-word dominance, keep iff both stay
    under their thresholds.  Pure row-local array expressions."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    g2 = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    dup_frac = 1 - F.size(F.array_distinct(g2)).cast("double") / F.size(g2)
    maxf = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda d_: F.size(F.filter(words, lambda w: w == d_)),
        )
    )
    top_frac = maxf.cast("double") / n
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(dup_frac, 6).alias("dup_2gram_frac"),
        F.round(top_frac, 6).alias("top_word_frac"),
        (
            (dup_frac <= F.lit(float(dup2_max))) & (top_frac <= F.lit(float(top_max)))
        ).alias("keep"),
    )


@register(
    "j29_decontamination",
    oracle="""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(w) - 2, 1) + 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
      FROM w),
ev AS (SELECT doc_id, unnest(gs) AS gr FROM g WHERE source = 'src0'),
tr AS (SELECT DISTINCT unnest(gs) AS gr FROM g WHERE source <> 'src0'),
hit AS (SELECT ev.doc_id, COUNT(*) AS n_hit
        FROM ev JOIN tr ON ev.gr = tr.gr GROUP BY ev.doc_id),
tot AS (SELECT doc_id, len(gs) AS n_grams FROM g WHERE source = 'src0')
SELECT tot.doc_id, n_grams,
       COALESCE(n_hit, 0) AS n_hit,
       ROUND(COALESCE(n_hit, 0)::DOUBLE / n_grams, 6) AS overlap_frac,
       (COALESCE(n_hit, 0)::DOUBLE / n_grams >= 0.65) AS contaminated
FROM tot LEFT JOIN hit ON hit.doc_id = tot.doc_id
""",
)
def j29_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j29 (extension): benchmark decontamination — the n-gram-overlap
    check every training pipeline runs against its eval sets (GPT-3
    appendix C; PaLM §C): docs from source 'src0' play the benchmark,
    the rest the training corpus, and an eval doc is contaminated when
    ≥65% of its distinct word-3-grams occur anywhere in training.

    Scale: training grams deduplicate via one distinct (shuffle on
    gram), the eval side is the SMALL side — at 100 TB the benchmark
    set broadcasts and the training corpus streams past it map-side;
    here the semi-join keys on the gram hash either way.

    Delegates to ``decontaminate`` with eval = source 'src0'."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return decontaminate(
        d, eval_pred=F.col("source") == "src0", ngram=3, overlap_min=0.65
    )


def decontaminate(
    docs: DataFrame, eval_pred, ngram: int = 3, overlap_min: float = 0.65
) -> DataFrame:
    """j29's engine, parameterized: flag eval docs (rows where the
    Column predicate ``eval_pred`` is TRUE) whose distinct
    word-``ngram``-gram overlap with the REST of ``docs`` (the training
    side) reaches ``overlap_min``.  Returns (doc_id, n_grams, n_hit,
    overlap_frac, contaminated) for the eval side only.

    Delegates to ``overlap_against`` (the two-table form) after
    splitting on the predicate."""
    g = docs.select(
        "doc_id", eval_pred.alias("is_eval"), word_shingles("text", ngram).alias("gs")
    )
    return _overlap_score(
        g.filter(F.col("is_eval")).select("doc_id", "gs"),
        g.filter(~F.col("is_eval")).select("gs"),
        overlap_min,
    )


def overlap_against(
    docs: DataFrame,
    reference: DataFrame,
    ngram: int = 3,
    overlap_min: float = 0.65,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-table decontamination scoring — the shape a curation route
    needs: score every row of ``docs`` by its distinct
    word-``ngram``-gram overlap against a SEPARATE ``reference`` corpus
    (a benchmark/eval set), returning (doc_id, n_grams, n_hit,
    overlap_frac, contaminated).  Used in the "remove training docs
    that contain eval content" direction: docs = the working training
    table, reference = the benchmark, drop rows flagged contaminated.

    Scale: the reference's distinct gram set is the SMALL side (eval
    suites are tiny next to a crawl) — one distinct + one gram-keyed
    semi-ish join; at 100 TB broadcast the reference grams and the
    training corpus streams past map-side."""
    d = docs.select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, ngram).alias("gs")
    )
    ref = reference.select(word_shingles(text_col, ngram).alias("gs"))
    return _overlap_score(d, ref, overlap_min)


def _overlap_score(
    ev: DataFrame, train: DataFrame, overlap_min: float
) -> DataFrame:
    """Shared core of ``decontaminate`` / ``overlap_against``: ``ev`` is
    (doc_id, gs: array<string>), ``train`` any frame with a gs column;
    releases per-ev-doc overlap accounting against train's distinct
    gram set."""
    tr_grams = train.select(F.explode("gs").alias("gr")).distinct()
    ev_grams = ev.select("doc_id", F.explode("gs").alias("gr"))
    hits = (
        ev_grams.join(tr_grams, "gr")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    tot = ev.select("doc_id", F.size("gs").cast("long").alias("n_grams"))
    frac = F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_grams")
    return (
        tot.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(frac, 6).alias("overlap_frac"),
            (frac >= F.lit(float(overlap_min))).alias("contaminated"),
        )
    )


@register(
    "j32_dup_ngram_coverage",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
        range(1, greatest(len(w) - 7, 1) + 1),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
             w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))) AS gr
      FROM w),
df AS (SELECT gr, COUNT(*) AS df FROM g GROUP BY gr),
d AS (SELECT doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM g JOIN df USING (gr) GROUP BY doc_id)
SELECT doc_id, n_grams, n_dup,
       ROUND(n_dup::DOUBLE / n_grams, 6) AS dup_frac,
       (n_dup::DOUBLE / n_grams >= 0.2) AS flagged
FROM d
""",
)
def j32_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j32 (extension): exact substring-level duplication coverage — for
    each document, the fraction of its distinct word-8-grams that occur
    in at least one OTHER document (docs are gram-distinct, so document
    frequency ≥ 2 ⇔ shared).  This is the per-document statistic behind
    exact-substring dedup decisions (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL 2022): j3's MinHash finds
    whole-doc near-twins, this finds boilerplate and quotation overlap
    that doc-level similarity misses.

    Scale: two gram-keyed partial-agg shuffles of O(total grams) rows —
    the document-frequency table is never joined to itself, so there is
    no Θ(Σ df²) pair blowup (the j3c trap).  At 100 TB, grams would be
    hashed (hash31_md5) before the shuffle to cap key width.

    Delegates to ``dup_ngram_coverage``."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return dup_ngram_coverage(d, ngram=8, flag_min=0.2)


def dup_ngram_coverage(
    docs: DataFrame, ngram: int = 8, flag_min: float = 0.2
) -> DataFrame:
    """j32's engine, parameterized: per-doc fraction of distinct
    word-``ngram``-grams shared with at least one other document
    (document frequency >= 2), flagged at ``flag_min``.  Two gram-keyed
    shuffles, no pair join."""
    g = docs.select("doc_id", F.explode(word_shingles("text", ngram)).alias("gr"))
    df_ = g.groupBy("gr").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        g.join(df_, "gr")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("long").alias("n_dup"),
        )
    )
    frac = F.col("n_dup").cast("double") / F.col("n_grams")
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_dup",
        F.round(frac, 6).alias("dup_frac"),
        (frac >= F.lit(float(flag_min))).alias("flagged"),
    )


def substring_dedup_release(
    docs: DataFrame,
    ngram: int = 8,
    mask_min: float = 0.15,
    drop_min: float = 0.6,
) -> DataFrame:
    """j32b's engine: substring-level dedup as an ACTION (VERDICT r8
    item 3) — j32 measures per-doc duplicated-``ngram``-gram coverage
    (Lee et al., ACL 2022); this MATERIALIZES the release a training
    pipeline actually runs on that statistic:

    * ``dup_frac >= drop_min``  → the doc is DROPPED (text_out NULL);
    * ``dup_frac >= mask_min``  → the doc is MASKED: every word covered
      by at least one duplicated gram occurrence is removed and the
      remaining words are re-joined — span removal, not doc removal;
    * otherwise                 → KEPT verbatim (lowercased — gram
      semantics are lowercase, so the release is too).

    One row per input doc: (doc_id, action, n_grams, n_dup, dup_frac,
    n_words, n_words_masked, text_out) — the kept/dropped/masked
    funnel is a COUNT over ``action`` and every span decision is
    replayable, so the whole action (not just the statistic) is
    hash-checkable.

    Plan shape: gram document-frequency is the j32 pair-join-free
    two-shuffle core (distinct doc-grams → df groupBy → per-doc agg);
    masking joins the POSITIONAL gram occurrences to the df>=2 gram
    set (gram-keyed shuffle, O(total grams)), explodes each hit to its
    ≤ ``ngram`` covered word positions (bounded ×n blowup), distincts
    per (doc, position), and rebuilds text ROW-LOCALLY with an
    index-aware transform+filter over the word array — no
    single-partition stage anywhere, nothing quadratic.  At 100 TB,
    grams would be hash31_md5'd before the shuffles to cap key width
    (same note as j32)."""
    base = docs.select("doc_id", F.lower(F.col("text")).alias("text"))
    w = base.select(
        "doc_id", "text", F.split("text", " ").alias("ws")
    ).withColumn("n_words", F.size("ws"))
    # positional (non-distinct) gram occurrences: gram i covers words
    # [i, i+ngram-1] (1-based), i in [1, max(n-ngram+1, 1)]
    occ = w.select(
        "doc_id",
        "n_words",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.col("n_words") - (ngram - 1), F.lit(1))
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("ws", i, ngram)).alias("gr"),
                ),
            )
        ).alias("o"),
    ).select("doc_id", "n_words", F.col("o.pos").alias("pos"), F.col("o.gr").alias("gr"))
    # Round 13: (a) the gram string is replaced by the j56b composite
    # 96-bit key (xxhash64, crc32−2³¹) BEFORE any shuffle — 12 fixed
    # bytes per occurrence instead of an ~8-word string (this is the
    # docstring's own "grams would be hashed before the shuffles" 100 TB
    # note, as code; collision bound: duplicate-gram decisions flip only
    # if two DISTINCT grams collide in 96 bits — C(V,2)·2⁻⁹⁶ ≈ 1e-19 at
    # this corpus's vocabulary, the j56b written trade); (b) the
    # occurrence table is materialized ONCE (eager localCheckpoint) —
    # the round-13 profile showed its explode+hash subtree computed
    # twice (df branch + mask branch, ~2×10 s runTime at sf0.1).
    # Within-query cut, recomputed per invocation.
    occ = occ.select(
        "doc_id",
        "n_words",
        "pos",
        F.xxhash64("gr").alias("g1"),
        (F.crc32("gr") - F.lit(2**31)).cast("int").alias("g2"),
    ).localCheckpoint(eager=True)
    dg = occ.select("doc_id", "g1", "g2").distinct()
    dfq = dg.groupBy("g1", "g2").agg(F.count(F.lit(1)).alias("df"))
    stats = (
        dg.join(dfq, ["g1", "g2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
        )
    )
    # masked word positions: every position covered by a duplicated
    # gram occurrence (distinct per doc)
    mp = (
        occ.join(dfq.filter(F.col("df") >= 2).select("g1", "g2"), ["g1", "g2"])
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (ngram - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_masked"),
            F.collect_set("p").alias("mps"),
        )
    )
    frac = F.col("n_dup").cast("double") / F.col("n_grams")
    action = (
        F.when(frac >= F.lit(float(drop_min)), F.lit("drop"))
        .when(frac >= F.lit(float(mask_min)), F.lit("mask"))
        .otherwise(F.lit("keep"))
    )
    rebuilt = F.concat_ws(
        " ",
        F.filter(
            F.transform(
                F.col("ws"),
                lambda x, i: F.when(
                    F.array_contains(F.col("mps"), i + F.lit(1)), F.lit(None)
                ).otherwise(x),
            ),
            lambda x: x.isNotNull(),
        ),
    )
    out = (
        w.join(stats, "doc_id")
        .join(mp, "doc_id", "left")
        .withColumn("action", action)
    )
    return out.select(
        "doc_id",
        "action",
        "n_grams",
        "n_dup",
        F.round(frac, 6).alias("dup_frac"),
        "n_words",
        F.when(F.col("action") == "drop", F.col("n_words"))
        .when(F.col("action") == "mask", F.coalesce(F.col("n_masked"), F.lit(0)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_words_masked"),
        F.when(F.col("action") == "drop", F.lit(None).cast("string"))
        .when(F.col("action") == "mask", rebuilt)
        .otherwise(F.col("text"))
        .alias("text_out"),
    )


# j32b's planted corpus: each doc gets a twin (doc_id + 300000) made of
# the doc's FIRST 16 WORDS followed by the doc's words REVERSED — the
# shared 16-word head duplicates exactly the head's 8-grams in both
# docs (span-maskable boilerplate), while the reversed tail's grams are
# unique (word salad reversed is a fresh gram stream).  Doc lengths
# 10-99 then spread dup_frac across the keep/mask/drop bands: short
# docs are head-only (frac 1.0 → drop), long docs dilute (→ keep),
# the middle masks.
_J32B_CORPUS_CTES = """
WITH orig AS (SELECT doc_id, lower(text) AS t FROM documents),
tw AS (SELECT doc_id + 300000 AS doc_id,
              array_to_string(string_split(t, ' ')[1:16], ' ') || ' ' ||
              array_to_string(list_reverse(string_split(t, ' ')), ' ') AS t
       FROM orig),
corpus AS (SELECT * FROM orig UNION ALL SELECT * FROM tw)"""

_J32B_ORACLE = f"""{_J32B_CORPUS_CTES},
w AS (SELECT doc_id, t, string_split(t, ' ') AS ws, len(string_split(t, ' ')) AS n_words
      FROM corpus),
occ AS (SELECT doc_id, n_words, u.pos,
               array_to_string(ws[u.pos:u.pos+7], ' ') AS gr
        FROM w, LATERAL unnest(range(1, greatest(n_words - 7, 1) + 1)) u(pos)),
dg AS (SELECT DISTINCT doc_id, gr FROM occ),
dfq AS (SELECT gr, COUNT(*) AS df FROM dg GROUP BY gr),
stats AS (SELECT doc_id, COUNT(*) AS n_grams,
                 CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
          FROM dg JOIN dfq USING (gr) GROUP BY doc_id),
mp AS (SELECT DISTINCT o.doc_id, u.p
       FROM occ o JOIN dfq ON o.gr = dfq.gr AND dfq.df >= 2,
            LATERAL unnest(range(o.pos, o.pos + 8)) u(p)),
mstat AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_masked FROM mp GROUP BY doc_id),
allpos AS (SELECT w.doc_id, u.p, ws[u.p] AS word
           FROM w, LATERAL unnest(range(1, n_words + 1)) u(p)),
keptw AS (SELECT a.doc_id,
                 COALESCE(string_agg(a.word, ' ' ORDER BY a.p), '') AS rebuilt
          FROM allpos a LEFT JOIN mp ON mp.doc_id = a.doc_id AND mp.p = a.p
          WHERE mp.p IS NULL GROUP BY a.doc_id),
rel AS (
  SELECT w.doc_id,
         CASE WHEN n_dup::DOUBLE / n_grams >= 0.6 THEN 'drop'
              WHEN n_dup::DOUBLE / n_grams >= 0.15 THEN 'mask'
              ELSE 'keep' END AS action,
         n_grams, n_dup,
         ROUND(n_dup::DOUBLE / n_grams, 6) AS dup_frac,
         CAST(n_words AS INTEGER) AS n_words,
         w.t, COALESCE(k.rebuilt, '') AS rebuilt,
         COALESCE(m.n_masked, 0) AS n_masked
  FROM w JOIN stats ON stats.doc_id = w.doc_id
  LEFT JOIN mstat m ON m.doc_id = w.doc_id
  LEFT JOIN keptw k ON k.doc_id = w.doc_id)
SELECT doc_id, action, n_grams, n_dup, dup_frac, n_words,
       CAST(CASE WHEN action = 'drop' THEN n_words
                 WHEN action = 'mask' THEN n_masked
                 ELSE 0 END AS BIGINT) AS n_words_masked,
       CASE WHEN action = 'drop' THEN NULL
            WHEN action = 'mask' THEN rebuilt
            ELSE t END AS text_out
FROM rel
"""


@register("j32b_substring_dedup", oracle=_J32B_ORACLE)
def j32b_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j32b (extension): substring-level dedup as an ACTION over a
    planted head-duplicated corpus — every doc plus a twin whose first
    16 words repeat the doc's head and whose tail is the doc reversed
    (boilerplate-with-fresh-content, the shape Lee et al.'s
    exact-substring dedup targets).  Docs above 60% duplicated-8-gram
    coverage drop, docs above 15% get their duplicated SPANS removed
    (the masked text itself is released and hash-checked word for
    word), the rest keep.  j37/j26 act at doc/segment granularity;
    this is the span-granularity member of the dedup action family.

    Delegates to ``substring_dedup_release``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    ws = F.split("text", " ")
    twin = d.select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(ws, 1, 16)),
            F.lit(" "),
            F.concat_ws(" ", F.reverse(ws)),
        ).alias("text"),
    )
    return substring_dedup_release(spread_small_scan(d.unionByName(twin)), ngram=8)


def maximal_dup_spans(
    docs: DataFrame,
    ngram: int = 8,
    min_span: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """j56's engine: the MAXIMAL duplicated spans of each document —
    the span inventory behind Lee et al.'s ExactSubstr dedup ("Dedupli-
    cating Training Data Makes Language Models Better", ACL 2022),
    which removes every substring (above a length floor) that occurs
    more than once in the CORPUS.  j32b acts at fixed-gram granularity
    and releases masked text; this releases the spans themselves:
    (doc_id, span_start, span_len, n_grams_in_span), one row per
    maximal run of duplicated ``ngram``-word windows, kept when
    span_len >= ``min_span`` words.

    Semantics (and how they map to the suffix-array form):
    * a window is duplicated when its gram occurs >= 2 times in the
      corpus by TOTAL OCCURRENCE count — unlike j32/j32b's per-doc
      distinct df, this also catches a document repeating its own
      boilerplate (Lee et al. count occurrences in the concatenated
      corpus, which includes self-repeats);
    * a substring of m >= ngram words duplicated anywhere appears as
      m − ngram + 1 consecutive duplicated window starts, so merging
      consecutive covered starts (gaps-and-islands) yields exactly the
      UNION of all duplicated substrings of length >= ngram — the same
      region ExactSubstr cuts.  Two abutting spans copied from
      DIFFERENT sources merge into one released row, exactly as their
      union is removed by the reference algorithm; spans shorter than
      ``ngram`` words are invisible (the granularity dial a
      suffix-array pays an O(corpus) global sort to avoid);
    * span_end is capped at the document length (a short doc's only
      window is its whole text — its span must not claim ``ngram``
      words the doc does not have).

    Plan shape: one positional gram explode (O(total words)), one
    gram-keyed partial-agg count, one gram-keyed join back, and a
    PARTITIONED window (per doc_id, never global) for the island ids —
    no pair join, no Θ(Σ df²) stage, nothing single-partition.  At
    100 TB grams would be hash31_md5'd before the shuffles to cap key
    width (same note as j32), and the heaviest-df grams (stop-phrase
    boilerplate) are exactly the ones worth a frequency cap upstream."""
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("text")
    )
    w = base.select("doc_id", F.split("text", " ").alias("ws")).withColumn(
        "n_words", F.size("ws")
    )
    occ = w.select(
        "doc_id",
        "n_words",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.col("n_words") - (ngram - 1), F.lit(1))
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice("ws", i, ngram)).alias("gr"),
                ),
            )
        ).alias("o"),
    ).select("doc_id", "n_words", F.col("o.pos").alias("pos"), F.col("o.gr").alias("gr"))
    dup = (
        occ.groupBy("gr")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gr")
    )
    covered = occ.join(dup, "gr").select("doc_id", "n_words", "pos")
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        covered.withColumn("isl", F.col("pos") - F.row_number().over(w_isl))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            F.least(F.max("pos") + (ngram - 1), F.min("n_words")).alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams_in_span"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start") + 1)
        .filter(F.col("span_len") >= min_span)
    )
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_len").cast("long").alias("span_len"),
        "n_grams_in_span",
    )


# j56 runs over j32b's planted corpus (head-duplicated twins): the
# 16-word shared head is a guaranteed >= min_span maximal span in both
# doc and twin, while the reversed tail contributes none — plus whatever
# organic cross-doc or WITHIN-doc boilerplate the corpus carries (the
# occurrence-count semantics j32b's distinct-df deliberately excludes).
_J56_ORACLE = f"""{_J32B_CORPUS_CTES},
w AS (SELECT doc_id, string_split(t, ' ') AS ws,
             len(string_split(t, ' ')) AS n_words
      FROM corpus),
occ AS (SELECT doc_id, n_words, u.pos,
               array_to_string(ws[u.pos:u.pos+7], ' ') AS gr
        FROM w, LATERAL unnest(range(1, greatest(n_words - 7, 1) + 1)) u(pos)),
dup AS (SELECT gr FROM (SELECT gr, COUNT(*) AS cnt FROM occ GROUP BY gr)
        WHERE cnt >= 2),
cov AS (SELECT o.doc_id, o.n_words, o.pos,
               o.pos - ROW_NUMBER() OVER (PARTITION BY o.doc_id
                                          ORDER BY o.pos) AS isl
        FROM occ o JOIN dup USING (gr)),
sp AS (SELECT doc_id, MIN(pos) AS span_start,
              LEAST(MAX(pos) + 7, MIN(n_words)) AS span_end,
              CAST(COUNT(*) AS BIGINT) AS n_grams_in_span
       FROM cov GROUP BY doc_id, isl)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_len,
       n_grams_in_span
FROM sp
WHERE span_end - span_start + 1 >= 12
"""


@register("j56_maximal_dup_spans", oracle=_J56_ORACLE)
def j56_maximal_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j56 (extension): Lee et al. ExactSubstr span inventory — the
    maximal duplicated word-spans (>= 12 words, 8-gram windows,
    occurrence-count semantics so self-repeats count) over the j32b
    planted head-duplicated corpus.  The released rows are the exact
    regions the reference algorithm would cut; j32b is the masking
    ACTION at the same granularity, this is the span-level evidence a
    pipeline logs and audits.  Delegates to ``maximal_dup_spans``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    ws = F.split("text", " ")
    twin = d.select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(ws, 1, 16)),
            F.lit(" "),
            F.concat_ws(" ", F.reverse(ws)),
        ).alias("text"),
    )
    # Single-file corpus => 1-2 scan splits; the gram explode is the
    # CPU wall (guide §2.5 input skew) — spread before it (no-op on
    # multi-split inputs).
    return maximal_dup_spans(
        spread_small_scan(d.unionByName(twin)), ngram=8, min_span=12
    )


def _char_occ(
    docs: DataFrame, cgram: int, id_col: str, text_col: str
) -> DataFrame:
    """Positional character-window occurrences (doc_id, n_chars, pos,
    gr) — the shared front of the single-pass and multipass ExactSubstr
    engines, so the two forms cannot drift on window generation."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("text")
    ).withColumn("n_chars", F.length("text"))
    return base.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.col("n_chars") - (cgram - 1), F.lit(1))
                ),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.col("text").substr(i, F.lit(cgram)).alias("gr"),
                ),
            )
        ).alias("o"),
    ).select("doc_id", "n_chars", F.col("o.pos").alias("pos"), F.col("o.gr").alias("gr"))


def _spans_from_covered(
    covered: DataFrame, cgram: int, min_span: int
) -> DataFrame:
    """Gaps-and-islands merge of covered window starts into maximal
    spans — the shared tail of both ExactSubstr engines.  ``covered``
    is (doc_id, n_chars, pos)."""
    from pyspark.sql import Window

    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        covered.withColumn("isl", F.col("pos") - F.row_number().over(w_isl))
        .groupBy("doc_id", "isl")
        .agg(
            F.min("pos").alias("span_start"),
            F.least(F.max("pos") + (cgram - 1), F.min("n_chars")).alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams_in_span"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start") + 1)
        .filter(F.col("span_len") >= min_span)
    )
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_len").cast("long").alias("span_len"),
        "n_grams_in_span",
    )


def maximal_dup_spans_chars(
    docs: DataFrame,
    cgram: int = 20,
    min_span: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    skew_salt: int = 0,
    hashed_keys: bool = True,
) -> DataFrame:
    """j56b's engine: ``maximal_dup_spans`` at CHARACTER granularity —
    the form Lee et al. actually run (their ExactSubstr suffix array is
    built over bytes, threshold 50 bytes, not word tokens).  A window
    is ``cgram`` consecutive characters; a window duplicated anywhere
    in the corpus (total occurrence count >= 2, self-repeats included)
    marks its start covered; merging consecutive covered starts
    (gaps-and-islands per doc) yields the union of all duplicated
    substrings of length >= ``cgram`` — released as (doc_id,
    span_start, span_len, n_grams_in_span) in CHARACTER offsets, kept
    at span_len >= ``min_span`` (Lee et al.'s 50-byte floor).

    Relative to the word-gram j56: word tokenization needs a tokenizer
    contract and loses intra-word duplication; the char form is
    tokenizer-free and anchors spans at exact byte offsets — the
    offsets a downstream cutter feeds to substr().  The price is
    ~5× more windows per doc (one per character instead of one per
    word).

    Plan shape — measured, not assumed (BASELINE round 10b A/B at
    sf1): coverage is ONE gram-partitioned count WINDOW over the
    positional explode (occurrences shuffle by gram once; cnt >= 2
    filters in place) instead of j56's groupBy + join-back — the join
    was the cost center (the 42M-row string-keyed sort-merge join
    alone cost more than the whole window form; 279 s → 103 s at sf1).

    ``hashed_keys`` (default True — VERDICT r11 item 1): the gram key
    exists only INSIDE the coverage computation (released rows carry
    character offsets, never grams), so the shuffle can key on any
    injective-enough encoding.  The default replaces the ``cgram``-char
    string key with the COMPOSITE (xxhash64(gr), crc32(gr)) — 12
    fixed-width bytes vs ~32 for a 20-char string in the UnsafeRow
    format (8-byte slot + data rounded to 8) — cutting the dominant
    occurrence shuffle's key bytes ~2.5× and replacing string compares
    with fixed-width compares in the shuffle sort.  Collision bound,
    written down: two distinct grams merge only if they collide in
    BOTH hashes; with xxhash64 (64-bit) and crc32 (32-bit) independent
    that is 2^-96 per pair, so D distinct grams expect D²/2^97
    colliding pairs — ≈ 6e-12 at the sf100 regime's D ≈ 1e9 and still
    ≈ 6e-6 at a 100 TB corpus's D ≈ 1e12.  (A NAKED 64-bit key is not
    shippable: D ≈ 1e9 gives ~3 % birthday risk.)  A collision's
    effect is one-sided and bounded: it merges two grams' counts,
    which can only mark a unique gram as covered (a spurious or
    extended span) — it can never erase a true duplicated span.
    History: round 10b measured an md5-based hash64 key and rejected
    it (+14 % at sf1 — md5 CPU exceeded the local shuffle-width
    saving); round 11 measured JVM xxhash64 at sf10 and it WON (−11 %,
    645.0 → 572.4 s) because the second decade is shuffle-byte-bound;
    the round-12 composite A/B is in BASELINE.md.  ``hashed_keys=
    False`` keeps the raw-string key for referee runs.

    The trade the window form accepts: no map-side
    partial agg, so one adversarially hot gram lands in one task —
    bounded on word-soup corpora (grams cap in the tens of thousands
    per replica), NOT bounded on boilerplate-grade corpora.

    ``skew_salt`` (VERDICT r10 item 1) is that hazard's IN-CODE guard,
    a salted two-level dup detection with a BIT-IDENTICAL release:
    occurrences pre-bucket on pmod(xxhash64(doc_id, pos), skew_salt),
    level 1 counts per (gram, bucket) — map-side partial agg restored,
    any reducer key holds <= 1/skew_salt of a hot gram — level 2 sums
    the <= skew_salt partials per gram as a gram-partitioned window
    OVER THE PARTIAL TABLE (bounded: a partition holds <= skew_salt
    one-row-per-bucket partials, never occurrences — round 12 folded
    the former sum-then-join-back pair into this one window so the
    occurrence explode runs twice, not three times), and coverage
    joins back on (gram, bucket) so even the join shuffle spreads a
    hot gram over ``skew_salt`` tasks.  No single task ever sees a
    whole hot gram.
    The salt only routes rows; cnt >= 2 is computed over the exact
    global count, so the released spans are identical to the window
    form's (property-pinned on a planted 30 %-hot gram in tests).  The
    window form (skew_salt=0) stays the default for word-soup corpora
    where its single shuffle wins; j56c registers the guarded form on
    a planted boilerplate corpus.  The island window stays PARTITIONED
    by doc; nothing is all-pairs, nothing global."""
    from pyspark.sql import Window

    occ = _char_occ(docs, cgram, id_col, text_col)
    if hashed_keys:
        # Composite 96-bit key replaces the cgram-char string BEFORE
        # the gram shuffle — collision bound in the docstring.
        occ = occ.select(
            "doc_id",
            "n_chars",
            "pos",
            F.xxhash64("gr").alias("g1"),
            # crc32 yields unsigned 32-bit as BIGINT; shift into the
            # signed int range (bijective) so the key slot is 4 bytes.
            (F.crc32("gr") - F.lit(2**31)).cast("int").alias("g2"),
        )
        gkey = ["g1", "g2"]
    else:
        gkey = ["gr"]
    if skew_salt > 0:
        occ_s = occ.withColumn(
            "sb", F.pmod(F.xxhash64("doc_id", "pos"), F.lit(skew_salt))
        )
        part = occ_s.groupBy(*gkey, "sb").agg(F.count(F.lit(1)).alias("c"))
        # Level 2 as a WINDOW over the partial table (<= skew_salt rows
        # per gram by construction — the salt bounds the partition, so
        # this is NOT the occurrence-window hazard the guard removes).
        # The round-11 form consumed `part` twice (a global-sum branch
        # plus a join back), and Catalyst prunes each consumer
        # differently, so ReuseExchange never fires and the occurrence
        # explode ran THREE times — one whole explode + aggregation
        # pipeline of the measured 1.4-3.5x guard price (VERDICT r11
        # item 5 / NEXT h).  Folding level 2 into one window over the
        # already-aggregated partials keeps the task bound and drops
        # that pipeline: the explode now runs twice (once feeding the
        # partial counts, once feeding the coverage join), the
        # structural minimum without materializing occurrences.
        dup_keyed = (
            part.withColumn(
                "cnt", F.sum("c").over(Window.partitionBy(*gkey))
            )
            .filter(F.col("cnt") >= 2)
            .select(*gkey, "sb")
        )
        covered = occ_s.join(dup_keyed, gkey + ["sb"]).select(
            "doc_id", "n_chars", "pos"
        )
    else:
        covered = (
            occ.withColumn(
                "cnt", F.count(F.lit(1)).over(Window.partitionBy(*gkey))
            )
            .filter(F.col("cnt") >= 2)
            .select("doc_id", "n_chars", "pos")
        )
    return _spans_from_covered(covered, cgram, min_span)


# Byte-rational pass derivation (the _J9B_BCAST_MAX_F32 discipline
# applied to the multipass ExactSubstr footprint) — both constants are
# MEASURED on-disk figures from the completed sf100 run (BASELINE
# round 12: 2.8e9 occurrence rows; live gram shuffle ~17-20 GB per
# P=4 pass -> ~26-28 compressed bytes/row; 36 GB of covered parquet
# over a covered~=everything corpus -> ~14 bytes/row worst case):
_J56D_OCC_SHUF_B = 28  # on-disk bytes per occurrence row in one pass's
#                        lz4-compressed gram shuffle (map output + sort
#                        spill, measured live per-pass volume)
_J56D_COV_PARQ_B = 14  # bytes per covered row in the accumulated
#                        parquet, at the covered==occ worst case — this
#                        floor is IRREDUCIBLE by P (all covered rows
#                        must exist before the island stage)
_J56D_MAX_PASSES = 64  # past this, scan-pass cost dominates any
#                        footprint win; a budget that derives more is
#                        effectively too small for the corpus


def derive_dup_span_passes(
    docs: DataFrame,
    disk_budget_bytes: int,
    cgram: int = 20,
    text_col: str = "text",
) -> int:
    """Derive the multipass ExactSubstr pass count from the corpus and
    a local-disk budget, using the MEASURED sf100 byte constants.

    Model: peak disk ~= (one gram range's shuffle) + (accumulated
    covered parquet, worst case covered == every window) =
    occ_rows * _J56D_OCC_SHUF_B / P  +  occ_rows * _J56D_COV_PARQ_B,
    where occ_rows = sum(greatest(n_chars - cgram + 1, 1)) — the exact
    window count ``_char_occ`` explodes.  Solving for the smallest P
    that fits the budget:  P = ceil(occ_shuf / (budget - cov_floor)).

    The covered-parquet floor is irreducible by P, so a budget below
    it raises ``ValueError`` naming the floor — no pass count can make
    the job fit, and a silent attempt would die mid-island exactly the
    way the first sf100 attempt did (BASELINE round 12).  The one
    corpus-stats aggregate collects a single scalar (driver-side
    bounded, the repo-wide discipline)."""
    import math

    occ_rows = (
        docs.agg(
            F.sum(
                F.greatest(
                    F.length(F.lower(F.col(text_col))) - (cgram - 1),
                    F.lit(1),
                )
            ).alias("occ")
        ).collect()[0][0]
        or 0
    )
    if occ_rows == 0:
        return 1
    cov_floor = occ_rows * _J56D_COV_PARQ_B
    headroom = disk_budget_bytes - cov_floor
    if headroom <= 0:
        raise ValueError(
            f"disk budget {disk_budget_bytes} B is below the "
            f"irreducible covered-parquet floor ~{cov_floor} B for "
            f"{occ_rows} windows; no pass count fits — raise the "
            "budget or shrink the corpus"
        )
    p = math.ceil(occ_rows * _J56D_OCC_SHUF_B / headroom)
    return max(1, min(p, _J56D_MAX_PASSES))


def maximal_dup_spans_chars_multipass(
    docs: DataFrame,
    cgram: int = 20,
    min_span: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    passes: int | str = 4,
    scratch: str | None = None,
    disk_budget_bytes: int | None = None,
) -> DataFrame:
    """The ExactSubstr span inventory with BOUNDED PEAK SHUFFLE
    FOOTPRINT — the external-memory form of ``maximal_dup_spans_chars``
    for corpora whose single occurrence shuffle exceeds local disk
    (the measured j56b sf100 wall: ~2.8 B occurrence rows ≈ 134 GB of
    map output + sort spill vs 77 GB free — BASELINE round 12).

    The gram KEY SPACE is hash-partitioned into ``passes`` ranges
    (pmod(xxhash64(gr), passes)); each pass re-scans the corpus,
    explodes windows, keeps only its range, and runs the gram-count
    coverage window on that range alone.  BIT-IDENTICAL to the
    single-pass release by construction: the ranges PARTITION grams,
    so every gram's global count is computed wholly inside exactly one
    pass, the union of per-pass covered positions equals the
    single-pass covered set, and the shared island merge
    (``_spans_from_covered``) then sees identical input
    (property-pinned at several pass counts).

    Peak footprint: each pass is its OWN JOB — its covered positions
    land in session-scoped parquet, and a ContextCleaner nudge
    releases the pass's shuffle files before the next pass starts —
    so peak disk ≈ one range's shuffle (~1/passes of the total) plus
    the accumulated covered parquet.  The ISLAND MERGE is bounded the
    same way by DOC range (covered can approach the full occurrence
    volume on boilerplate-heavy corpora — measured at sf100, BASELINE
    round 12 — and docs partition independently, so per-range spans
    union identically).  The price is ``passes`` corpus scans +
    window explodes: the classic external-memory trade (scan passes
    for footprint).
    Composite hashed keys are mandatory here (the range hash IS the
    shuffle key's first half); collision bound as in the single-pass
    docstring.

    ``passes="auto"`` derives the pass count byte-rationally from the
    corpus and a disk budget (``disk_budget_bytes`` argument, else the
    ``SPARK_GRAFT_DISK_BUDGET`` environment variable, in bytes) via
    ``derive_dup_span_passes`` — the measured-constant model from the
    completed sf100 run.  No silent default budget: guessing the disk
    wrong defeats the entire point of the bounded form, so "auto"
    without a budget raises ``ValueError``."""
    import os
    import shutil

    from ma_anonymization_etl_spark.sources.io import scratch_dir

    if passes == "auto":
        budget = disk_budget_bytes
        if budget is None:
            env = os.environ.get("SPARK_GRAFT_DISK_BUDGET")
            budget = int(env) if env else None
        if budget is None:
            raise ValueError(
                'passes="auto" needs disk_budget_bytes or the '
                "SPARK_GRAFT_DISK_BUDGET environment variable (bytes)"
            )
        passes = derive_dup_span_passes(
            docs, budget, cgram=cgram, text_col=text_col
        )
    if passes < 2:
        return maximal_dup_spans_chars(
            docs, cgram=cgram, min_span=min_span,
            id_col=id_col, text_col=text_col,
        )
    from pyspark.sql import Window

    spark = docs.sparkSession
    out = scratch or os.path.join(
        scratch_dir(spark, "j56_multipass"), "covered"
    )
    shutil.rmtree(out, ignore_errors=True)
    for p in range(passes):
        occ_p = (
            _char_occ(docs, cgram, id_col, text_col)
            .select(
                "doc_id",
                "n_chars",
                "pos",
                F.xxhash64("gr").alias("g1"),
                (F.crc32("gr") - F.lit(2**31)).cast("int").alias("g2"),
            )
            .filter(F.pmod(F.col("g1"), F.lit(passes)) == p)
        )
        covered_p = (
            occ_p.withColumn(
                "cnt", F.count(F.lit(1)).over(Window.partitionBy("g1", "g2"))
            )
            .filter(F.col("cnt") >= 2)
            .select("doc_id", "n_chars", "pos")
        )
        covered_p.write.mode("append").parquet(out)
        # Release this pass's shuffle files before the next pass maps:
        # the ContextCleaner drops shuffles whose dependencies are
        # unreachable, and the JVM only notices promptly under a GC.
        spark._jvm.System.gc()
    # The island merge is footprint-bounded the same way, by DOC
    # range: on a boilerplate-heavy corpus covered ≈ most positions
    # (the sf100 probe measured 36 GB of covered parquet — the
    # doc-keyed island shuffle was the second disk wall, BASELINE
    # round 12), and docs partition independently across ranges, so
    # the per-range span union is trivially identical.
    covered = spark.read.parquet(out)
    spans_out = os.path.join(os.path.dirname(out), "spans")
    shutil.rmtree(spans_out, ignore_errors=True)
    for p in range(passes):
        sp = _spans_from_covered(
            covered.filter(F.pmod(F.col("doc_id"), F.lit(passes)) == p),
            cgram,
            min_span,
        )
        sp.write.mode("append").parquet(spans_out)
        spark._jvm.System.gc()
    return spark.read.parquet(spans_out)


# j56b's planted corpus: char-level twins sharing the doc's first 100
# CHARACTERS (>= the 50-char floor, so doc and twin each release a
# head-anchored span), tailed with the char-reversed text — which
# cannot organically share a 20-char window with forward text except
# where the corpus genuinely carries one (and then both engines see it).
_J56B_ORACLE = """
WITH corpus AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 600000,
         substr(lower(text), 1, 100) || ' ' || reverse(lower(text))
  FROM documents
),
w AS (SELECT doc_id, t, length(t) AS n_chars FROM corpus),
occ AS (SELECT doc_id, n_chars, u.pos, substr(t, u.pos, 20) AS gr
        FROM w, LATERAL unnest(range(1, greatest(n_chars - 19, 1) + 1)) u(pos)),
dup AS (SELECT gr FROM (SELECT gr, COUNT(*) AS cnt FROM occ GROUP BY gr)
        WHERE cnt >= 2),
cov AS (SELECT o.doc_id, o.n_chars, o.pos,
               o.pos - ROW_NUMBER() OVER (PARTITION BY o.doc_id
                                          ORDER BY o.pos) AS isl
        FROM occ o JOIN dup USING (gr)),
sp AS (SELECT doc_id, MIN(pos) AS span_start,
              LEAST(MAX(pos) + 19, MIN(n_chars)) AS span_end,
              CAST(COUNT(*) AS BIGINT) AS n_grams_in_span
       FROM cov GROUP BY doc_id, isl)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_len,
       n_grams_in_span
FROM sp
WHERE span_end - span_start + 1 >= 50
"""


@register("j56b_maximal_dup_spans_chars", oracle=_J56B_ORACLE)
def j56b_maximal_dup_spans_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j56b (extension): the ExactSubstr span inventory at CHARACTER
    granularity — 20-char windows, 50-char floor (Lee et al.'s actual
    byte-level form; j56 is the word-gram sibling), over a planted
    corpus of 100-char-head-duplicated twins.  Span offsets are exact
    character anchors a cutter can substr() on.  Delegates to
    ``maximal_dup_spans_chars``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    twin = d.select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 100), F.lit(" "), F.reverse(F.col("text"))
        ).alias("text"),
    )
    # Spread the 1-2-split planted corpus before the char-window
    # explode (guide §2.5; measured −52 % at sf0.1, no-op at scale).
    return maximal_dup_spans_chars(
        spread_small_scan(d.unionByName(twin)), cgram=20, min_span=50
    )


# j56c's planted corpus is the ADVERSARIAL shape the window form is
# weak against (VERDICT r10 item 1): every doc carries the same
# 58-char boilerplate footer, so each of its 39 footer-internal
# 20-char windows occurs in EVERY doc — a df = N hot gram per window
# position.  Under the gram-partitioned count window all those rows
# land in one task; under the salted two-level guard no task sees
# more than 1/skew_salt of any gram.
_J56C_FOOTER = " subscribe to our newsletter for weekly updates and offers"
_J56C_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, lower(text) || '{_J56C_FOOTER}' AS t FROM documents
),
w AS (SELECT doc_id, t, length(t) AS n_chars FROM corpus),
occ AS (SELECT doc_id, n_chars, u.pos, substr(t, u.pos, 20) AS gr
        FROM w, LATERAL unnest(range(1, greatest(n_chars - 19, 1) + 1)) u(pos)),
dup AS (SELECT gr FROM (SELECT gr, COUNT(*) AS cnt FROM occ GROUP BY gr)
        WHERE cnt >= 2),
cov AS (SELECT o.doc_id, o.n_chars, o.pos,
               o.pos - ROW_NUMBER() OVER (PARTITION BY o.doc_id
                                          ORDER BY o.pos) AS isl
        FROM occ o JOIN dup USING (gr)),
sp AS (SELECT doc_id, MIN(pos) AS span_start,
              LEAST(MAX(pos) + 19, MIN(n_chars)) AS span_end,
              CAST(COUNT(*) AS BIGINT) AS n_grams_in_span
       FROM cov GROUP BY doc_id, isl)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(span_start AS BIGINT) AS span_start,
       CAST(span_end - span_start + 1 AS BIGINT) AS span_len,
       n_grams_in_span
FROM sp
WHERE span_end - span_start + 1 >= 50
"""


@register("j56c_maximal_dup_spans_skewguard", oracle=_J56C_ORACLE)
def j56c_maximal_dup_spans_skewguard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j56c (extension): j56b's ExactSubstr span inventory under the
    SALTED SKEW GUARD (``skew_salt=32``), on the corpus shape that
    motivates it — every doc tailed with the same 58-char boilerplate
    footer, making each footer window a df = N hot gram (the
    real-crawl shape: shared headers, cookie banners, templates).  The
    guard's release is bit-identical to the window form's — the oracle
    recomputes global gram counts from first principles, so the salt
    routing cannot change a row.  Expect one 58-char footer span per
    doc plus whatever the corpus organically duplicates.  Delegates to
    ``maximal_dup_spans_chars(skew_salt=32)``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lower(F.col("text")), F.lit(_J56C_FOOTER)).alias("text"),
    )
    return maximal_dup_spans_chars(
        spread_small_scan(d), cgram=20, min_span=50, skew_salt=32
    )


# j56d shares j56b's oracle VERBATIM (identical twin corpus, identical
# release definition — the j44/j44b precedent): the forms differ only
# in shuffle STAGING, and the gram ranges partition the key space, so
# a drift between them turns this row red at every gate SF.
@register("j56d_dup_spans_multipass", oracle=_J56B_ORACLE)
def j56d_dup_spans_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j56d (extension, round 12): j56b's ExactSubstr span inventory
    via the PEAK-FOOTPRINT-BOUNDED multipass engine (4 gram-range
    passes, each its own job; ~1/4 of the occurrence shuffle on disk
    at any moment) — the external-memory form that fits the sf100
    corpus under a 77 GB local disk where the single-pass shuffle
    cannot (BASELINE round 12 arithmetic).  Release bit-identical to
    j56b by gram-range partitioning; the shared oracle re-attests that
    every gate run.  Delegates to
    ``maximal_dup_spans_chars_multipass``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    twin = d.select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 100), F.lit(" "), F.reverse(F.col("text"))
        ).alias("text"),
    )
    return maximal_dup_spans_chars_multipass(
        spread_small_scan(d.unionByName(twin)), cgram=20, min_span=50, passes=4
    )


# ---------------------------------------------------------------------------
# j60: edit-distance-verified fuzzy dedup — typo-level near duplicates
# ---------------------------------------------------------------------------
#
# MinHash/Jaccard dedup (j3/j50) sees BAGS OF SHINGLES — robust to
# reordering, blind to granularity below the shingle.  The complementary
# production contract is EDIT DISTANCE: "these two docs differ by <= tau
# character edits" (OCR noise, typo farms, template fills).  Exact
# all-pairs Levenshtein is Θ(N²·L²); the scalable shape is candidate
# BLOCKING + banded verify, which is what j60 registers.
_J60_TAU = 3
_J60_BLOCK = 16


def fuzzy_dup_pairs(
    docs: DataFrame,
    tau: int = _J60_TAU,
    block_len: int = _J60_BLOCK,
    id_col: str = "doc_id",
    text_col: str = "text",
    keys: tuple = ("p", "s"),
    block_df_cap: int | None = None,
) -> DataFrame:
    """j60's engine: candidate pairs share a PREFIX block (first
    ``block_len`` chars) or a SUFFIX block (last ``block_len``), with
    length difference <= ``tau`` (an edit-distance lower bound, applied
    INSIDE the candidate join); survivors verify with banded
    Levenshtein (threshold form — O(tau·L) per pair, not O(L²)) and
    release (a_id, b_id, dist) for dist <= tau, a < b.

    RECALL CONTRACT (explicit, oracle-replayed): a true near-pair whose
    edits touch EVERY enabled block escapes blocking — the standard
    multi-key blocking trade (Christen, TKDE 2012).  ``keys`` is the
    recall dial: "p" prefix, "s" suffix, and "m" the MIDDLE block
    (``block_len`` chars anchored at (n − block_len)//2 + 1) — j60b
    registers ("p","s","m"), which catches pairs whose edits hit both
    ends (tau < block spacing means ≤ tau edits cannot cover three
    disjoint blocks when 3·block_len + tau ≤ n... formally: any pair
    within tau edits shares at least one of the three blocks whenever
    the edits touch at most two of them).  Each key is one more row per
    doc in the SAME single self-join, not an extra join.  Precision is
    exact: every released pair carries its true edit distance.

    Plan shape: one (doc, key-type) explode (2 rows/doc), ONE
    equality self-join on (key_type, key) with the length filter in
    the join condition, partial-agg pair dedup (a pair sharing both
    keys emits once), then an id-keyed join back to texts for the
    banded verify — candidate volume is Σ_blocks C(df, 2), never N².

    ``block_df_cap`` (VERDICT r10 item 2) is the hot-block guard as
    CODE: blocks held by more than ``block_df_cap`` docs are removed
    from candidate generation by a BROADCAST anti-join against the hot
    set (at most N/cap distinct hot keys exist, so the hot list is
    tiny by construction and the full key table never shuffles).  The
    contract narrows to "pairs sharing at least one SUB-CAP block" —
    a pair whose every shared block is boilerplate-hot escapes, the
    LSH-banding style of trade; j60c registers it with the cap
    replayed structurally in the oracle.  Uncapped (None, the
    default), word-soup prefixes are near-unique and the planted
    twins dominate the blocks."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("text")
    ).withColumn("n", F.length("text"))
    key_exprs = {
        "p": F.substring("text", 1, block_len),
        "s": F.col("text").substr(
            F.greatest(F.col("n") - F.lit(block_len - 1), F.lit(1)),
            F.lit(block_len),
        ),
        "m": F.col("text").substr(
            F.greatest(
                F.floor((F.col("n") - block_len) / 2).cast("int") + 1, F.lit(1)
            ),
            F.lit(block_len),
        ),
    }
    kts = tuple(keys)
    key_rows = base.select(
        "doc_id",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(kt).alias("kt"), key_exprs[kt].alias("k"))
                    for kt in kts
                ]
            )
        ).alias("o"),
    ).select("doc_id", "n", F.col("o.kt").alias("kt"), F.col("o.k").alias("k"))
    if block_df_cap is not None:
        hot = (
            key_rows.groupBy("kt", "k")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > block_df_cap)
            .select("kt", "k")
        )
        # Materialize the hot set ONCE (round 12): the capped key table
        # feeds BOTH sides of the candidate self-join, and without this
        # each side re-derives the hot set from its own full key scan +
        # groupBy (runtime plan: 4 Generate nodes, 2 of them this
        # branch).  The hot set is tiny by construction (<= N/cap
        # distinct keys), so the local checkpoint is a bounded driver-
        # side job per call — recomputed every invocation, never cached
        # across runs.
        hot = hot.localCheckpoint(eager=True)
        key_rows = key_rows.join(F.broadcast(hot), ["kt", "k"], "left_anti")
    cand = (
        key_rows.alias("x")
        .join(
            key_rows.alias("y"),
            (F.col("x.kt") == F.col("y.kt"))
            & (F.col("x.k") == F.col("y.k"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (F.abs(F.col("x.n") - F.col("y.n")) <= tau),
        )
        .groupBy(F.col("x.doc_id").alias("a_id"), F.col("y.doc_id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("nk"))
        .drop("nk")
    )
    # Round 13: spread the verify across the session's cores with an
    # EXPLICIT partition count.  The banded Levenshtein is CPU-bound
    # (~ms/pair on long texts) while the candidate table is tiny in
    # BYTES, so AQE's byte-based coalescing funnels the whole verify
    # into 1-3 tasks (profiled: one 3.6 s single-task stage = j60c's
    # wall).  Partition count = defaultParallelism — the right sizing
    # for a CPU-bound stage at any scale (cores, not bytes).  Keyless
    # round-robin on purpose: a hash repartition on the pair key is
    # elided as redundant against the pair-dedup groupBy's partitioning
    # and the skew returns (measured); the round-robin's
    # sort-before-repartition cost is per-candidate-row, trivial.
    cand = cand.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    at = base.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_t"))
    bt = base.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_t"))
    return (
        cand.join(at, "a_id")
        .join(bt, "b_id")
        .withColumn("dist", F.levenshtein("a_t", "b_t", tau))
        .filter(F.col("dist") >= 0)
        .select("a_id", "b_id", F.col("dist").cast("long").alias("dist"))
    )


# j60's planted corpus: twins replace two characters at positions 20-21
# with 'qq' — edit distance <= 2 (= 2 unless the original already reads
# 'qq' there), prefix-16 AND suffix-16 blocks both intact, so blocking
# finds every twin and the verify releases its exact distance.
_J60_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 700000,
         substr(lower(text), 1, 19) || 'qq' || substr(lower(text), 22,
                length(lower(text)))
  FROM documents
),
b2 AS (SELECT doc_id, t, length(t) AS n FROM base),
keys AS (
  SELECT doc_id, n, 'p' AS kt, substr(t, 1, {_J60_BLOCK}) AS k FROM b2
  UNION ALL
  SELECT doc_id, n, 's',
         substr(t, GREATEST(n - {_J60_BLOCK - 1}, 1), {_J60_BLOCK}) FROM b2
),
cand AS (
  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
  FROM keys x JOIN keys y
    ON x.kt = y.kt AND x.k = y.k AND x.doc_id < y.doc_id
   AND ABS(x.n - y.n) <= {_J60_TAU}
)
SELECT a_id, b_id, CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM cand JOIN b2 a ON a.doc_id = a_id JOIN b2 b ON b.doc_id = b_id
WHERE levenshtein(a.t, b.t) <= {_J60_TAU}
"""


# j60b: the 3-key recall variant — same corpus, plus the middle block.
_J60B_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lower(text) AS t FROM documents
  UNION ALL
  SELECT doc_id + 700000,
         substr(lower(text), 1, 19) || 'qq' || substr(lower(text), 22,
                length(lower(text)))
  FROM documents
),
b2 AS (SELECT doc_id, t, length(t) AS n FROM base),
keys AS (
  SELECT doc_id, n, 'p' AS kt, substr(t, 1, {_J60_BLOCK}) AS k FROM b2
  UNION ALL
  SELECT doc_id, n, 's',
         substr(t, GREATEST(n - {_J60_BLOCK - 1}, 1), {_J60_BLOCK}) FROM b2
  UNION ALL
  SELECT doc_id, n, 'm',
         substr(t, GREATEST((n - {_J60_BLOCK}) // 2 + 1, 1), {_J60_BLOCK}) FROM b2
),
cand AS (
  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
  FROM keys x JOIN keys y
    ON x.kt = y.kt AND x.k = y.k AND x.doc_id < y.doc_id
   AND ABS(x.n - y.n) <= {_J60_TAU}
)
SELECT a_id, b_id, CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM cand JOIN b2 a ON a.doc_id = a_id JOIN b2 b ON b.doc_id = b_id
WHERE levenshtein(a.t, b.t) <= {_J60_TAU}
"""


@register("j60b_fuzzy_dedup_3key", oracle=_J60B_ORACLE)
def j60b_fuzzy_dedup_3key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j60b (extension): j60 with the MIDDLE block as a third key —
    the recall dial turned one notch (NEXT r10b item d): pairs whose
    edits hit both the prefix and the suffix now still block on the
    middle; only edits spread across all three blocks escape.  Same
    single self-join (3 rows/doc instead of 2), same banded verify,
    same planted corpus.  Delegates to ``fuzzy_dup_pairs``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    twin = d.select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 19),
            F.lit("qq"),
            F.col("text").substr(F.lit(22), F.length("text")),
        ).alias("text"),
    )
    return fuzzy_dup_pairs(d.unionByName(twin), keys=("p", "s", "m"))


@register("j60_fuzzy_dedup_edit", oracle=_J60_ORACLE)
def j60_fuzzy_dedup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j60 (extension): edit-distance fuzzy dedup — prefix/suffix-16
    blocked candidates, length filter inside the join, banded
    Levenshtein verify at tau=3, over a planted corpus of 2-char-
    substituted twins.  The candidate definition (the recall contract)
    and the exact released distances replay in the oracle.  Delegates
    to ``fuzzy_dup_pairs``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    twin = d.select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 19),
            F.lit("qq"),
            F.col("text").substr(F.lit(22), F.length("text")),
        ).alias("text"),
    )
    return fuzzy_dup_pairs(d.unionByName(twin))


# j60c's planted corpus is j60's adversarial shape: every 4th doc (and
# its twin) is prefixed with the same 20-char sponsor header, so the
# prefix-16 block becomes one hot key holding ~25 % of the corpus —
# C(df, 2) candidate blowup under uncapped blocking.  The df-cap drops
# that block; the planted twins still pair through their (unchanged,
# near-unique) suffix blocks.  Cap 64 is ~30x the organic block
# multiplicity, the j52b calibration.
_J60C_DF_CAP = 64
_J60C_HEADER = "[sponsored content] "
_J60C_ORACLE = f"""
WITH d0 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '{_J60C_HEADER}' || lower(text)
              ELSE lower(text) END AS t
  FROM documents
),
base AS (
  SELECT doc_id, t FROM d0
  UNION ALL
  SELECT doc_id + 700000,
         substr(t, 1, 19) || 'qq' || substr(t, 22, length(t))
  FROM d0
),
b2 AS (SELECT doc_id, t, length(t) AS n FROM base),
keys0 AS (
  SELECT doc_id, n, 'p' AS kt, substr(t, 1, {_J60_BLOCK}) AS k FROM b2
  UNION ALL
  SELECT doc_id, n, 's',
         substr(t, GREATEST(n - {_J60_BLOCK - 1}, 1), {_J60_BLOCK}) FROM b2
),
kdf AS (SELECT kt, k FROM (SELECT kt, k, COUNT(*) AS c FROM keys0
                           GROUP BY kt, k)
        WHERE c <= {_J60C_DF_CAP}),
keys AS (SELECT keys0.* FROM keys0 JOIN kdf USING (kt, k)),
cand AS (
  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
  FROM keys x JOIN keys y
    ON x.kt = y.kt AND x.k = y.k AND x.doc_id < y.doc_id
   AND ABS(x.n - y.n) <= {_J60_TAU}
)
SELECT a_id, b_id, CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
FROM cand JOIN b2 a ON a.doc_id = a_id JOIN b2 b ON b.doc_id = b_id
WHERE levenshtein(a.t, b.t) <= {_J60_TAU}
"""


@register("j60c_fuzzy_dedup_capped", oracle=_J60C_ORACLE)
def j60c_fuzzy_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j60c (extension): j60 under the EXPLICIT block df-cap contract
    (VERDICT r10 item 2 — the docstring knob as registered code, the
    j52b pattern).  The corpus plants the hazard: 25 % of docs share a
    sponsor-header prefix block, which uncapped would generate
    C(0.25N, 2) candidate verifies from one key.  The cap (64) removes
    hot blocks via a broadcast anti-join — the key table never
    shuffles a hot key — and the contract narrows to "pairs sharing a
    sub-cap block": the planted twins survive through their suffix
    blocks, and the oracle replays the cap structurally so the recall
    trade itself is hash-checked.  Delegates to
    ``fuzzy_dup_pairs(block_df_cap=_J60C_DF_CAP)``."""
    d0 = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(_J60C_HEADER), F.lower(F.col("text"))),
        )
        .otherwise(F.lower(F.col("text")))
        .alias("text"),
    )
    twin = d0.select(
        (F.col("doc_id") + 700000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 19),
            F.lit("qq"),
            F.col("text").substr(F.lit(22), F.length("text")),
        ).alias("text"),
    )
    return fuzzy_dup_pairs(d0.unionByName(twin), block_df_cap=_J60C_DF_CAP)


@register(
    "j34_grouped_split",
    oracle="""
WITH assigned AS (
  SELECT user_id, event_id,
         CASE WHEN (('0x' || substr(md5('split34|' || CAST(user_id AS VARCHAR)),
                     1, 15))::BIGINT) % 10 < 8
              THEN 'train' ELSE 'test' END AS split
  FROM events
), per_split AS (
  SELECT split, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
  FROM assigned GROUP BY split
), leak AS (
  SELECT COUNT(*) AS n_leaked_users FROM (
    SELECT user_id FROM assigned GROUP BY user_id
    HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT split, n_events, n_users,
       (SELECT n_leaked_users FROM leak) AS n_leaked_users
FROM per_split
""",
)
def j34_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j34 (extension): leakage-safe grouped train/test split — the
    split key is the GROUP (user_id), not the row, so every event of a
    user lands in the same split (GroupKFold semantics).  Row-level
    splitting of grouped data is the classic evaluation leak: the model
    sees the test users' behaviour at train time.  The 80/20 assignment
    is md5-derived from the group key (deterministic, reproducible,
    stable under re-runs and data growth — new events of a known user
    join their existing split), and the release carries its own audit:
    n_leaked_users counts groups present in both splits and must be 0
    by construction — the oracle recomputes it rather than trusting it.

    Scale: the split is a pure map-side projection (hash of the group
    key, no shuffle, no group materialization); the report is one
    groupBy.  Contrast j18/j19: those sample ROWS; this partitions
    GROUPS.

    Delegates to ``grouped_split_assign`` + ``grouped_split_audit``."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id")
    assigned = grouped_split_assign(e, "user_id", salt="split34|", train_buckets=8)
    return grouped_split_audit(assigned, "user_id")


def grouped_split_assign(
    df: DataFrame, group_col: str, salt: str = "split|", train_buckets: int = 8
) -> DataFrame:
    """j34's assignment, parameterized: adds a ``split`` column where
    the GROUP key (not the row) routes md5-deterministically to 'train'
    (``train_buckets`` of 10 buckets) or 'test' — GroupKFold semantics,
    map-side, no shuffle."""
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(group_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    return df.withColumn(
        "split", F.when(bucket < train_buckets, "train").otherwise("test")
    )


def grouped_split_audit(assigned: DataFrame, group_col: str) -> DataFrame:
    """j34's release: per-split row/group counts plus n_leaked_users —
    groups present in both splits (must be 0 by construction; recompute
    it, don't trust it)."""
    per_split = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(group_col).alias("n_users"),
    )
    leak = (
        assigned.groupBy(group_col)
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_leaked_users"))
    )
    return per_split.crossJoin(F.broadcast(leak))


@register(
    "j30_unigram_lm_score",
    # Per-token log-probs are rounded to 6 dp BEFORE the scaled-int64
    # sum, so the per-doc accumulation is order-independent and
    # engine-identical (the dsum discipline applied to model scores).
    oracle="""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT tok, COUNT(*) AS c FROM w GROUP BY tok),
tv AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM c),
lp AS (SELECT tok, CAST(ROUND(ln((c + 1.0) / (total + v)) * 1000000) AS BIGINT)
                     AS lnp6 FROM c, tv),
d AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(lnp6) AS s
      FROM w JOIN lp USING (tok) GROUP BY doc_id)
SELECT doc_id, n_tokens,
       ((-s) // n_tokens) / 1000000.0 AS avg_nll,
       ((-s) // n_tokens) <= 3410000 AS keep
FROM d
""",
)
def j30_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j30 (extension): model-based quality scoring with a corpus-fit
    unigram LM (add-one smoothing) — the shape of CCNet/LLaMA's
    KenLM-perplexity filter with the n-gram model reduced to n=1 so it
    runs on pure DataFrame ops (swap in a real LM UDF on a cluster
    with kenlm).  Score = average negative log-likelihood per token;
    docs at or below 3.41 nats/token (≈ this corpus's p80) are kept.

    Scale: the LM is a (vocab)-row table built with one groupBy —
    broadcast back against the exploded token stream, so scoring is
    map-side after one small shuffle; the model "training" and the
    scoring pass are the same two jobs at any corpus size.

    Delegates to ``unigram_lm_score`` with this corpus's p80 cut."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_lm_score(d, keep_max_micro_nats=3410000)


def unigram_lm_score(docs: DataFrame, keep_max_micro_nats: int = 3410000) -> DataFrame:
    """j30's engine, parameterized: fit an add-one-smoothed unigram LM
    on ``docs`` (doc_id, text) and score each doc's average NLL per
    token in exact micro-nats; keep iff <= ``keep_max_micro_nats``."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tv = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    lp = counts.crossJoin(F.broadcast(tv)).select(
        "tok",
        F.round(
            F.log((F.col("c") + 1.0) / (F.col("total") + F.col("v"))) * 1000000
        )
        .cast("long")
        .alias("lnp6"),
    )
    scored = (
        toks.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lnp6").alias("s"))
    )
    # Floor micro-nats via INTEGER division: a final ROUND(double, 6)
    # here hit a half-way boundary at sf0.1 where Spark (BigDecimal
    # HALF_UP) and DuckDB disagreed by 1e-6; integer ops cannot.
    micro = F.expr("(-s) div n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        (micro / 1000000.0).alias("avg_nll"),
        (micro <= F.lit(int(keep_max_micro_nats))).alias("keep"),
    )


# --- j24b: the funnel extended with repetition + LM-quality stages --------

_J24B_ORACLE = _J24_STAGES_SQL + """
, repm AS (
  SELECT doc_id,
         1 - len(list_distinct(list_transform(range(1, len(w)),
                                              i -> w[i] || ' ' || w[i+1])))::DOUBLE
             / (len(w) - 1) AS dup2,
         list_max(list_transform(list_distinct(w),
                                 d -> len(list_filter(w, x -> x = d))))::DOUBLE
             / len(w) AS topw
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM neard)
),
rep AS (SELECT neard.* FROM neard JOIN repm USING (doc_id)
        WHERE dup2 <= 0.051 AND topw <= 0.11),
wtok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM rep),
cnt AS (SELECT tok, COUNT(*) AS c FROM wtok GROUP BY tok),
tv AS (SELECT SUM(c) AS total, COUNT(*) AS v FROM cnt),
lp AS (SELECT tok, CAST(ROUND(ln((c + 1.0) / (total + v)) * 1000000) AS BIGINT)
                     AS lnp6 FROM cnt, tv),
dsc AS (SELECT doc_id, COUNT(*) AS n, SUM(lnp6) AS s
        FROM wtok JOIN lp USING (tok) GROUP BY doc_id),
lmk AS (SELECT rep.* FROM rep JOIN dsc USING (doc_id)
        WHERE -s / 1000000.0 / n <= 3.409)
""" + "\nUNION ALL\n".join(
    f"SELECT '{name}' AS stage, COUNT(*) AS n_docs,\n"
    f"       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)"
    f" AS n_ws_tokens FROM {cte}"
    for name, cte in [
        ("1_raw", "raw"), ("2_quality", "quality"), ("3_lang", "langf"),
        ("4_exact_dedup", "exactd"), ("5_near_dedup", "neard"),
        ("6_repetition", "rep"), ("7_lm_quality", "lmk"),
    ]
)


@register("j24b_curation_funnel_v2", oracle=_J24B_ORACLE)
def j24b_curation_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j24b: the full modern curation chain — j24's four stages plus
    within-doc repetition filtering (j27's Gopher signals: duplicate
    2-gram fraction ≤ 0.051, top-word dominance ≤ 0.11 — this derived
    corpus's ~p80s) and model-based quality (j30's smoothed unigram LM,
    FIT ON the stage-6 survivors — the model trains on the corpus it
    then filters, as CCNet does; keep ≤ 3.409 nats/token ≈ p85).  All
    seven stage (docs, tokens) counts replay in one DuckDB query.

    100 TB shape: stage 6 adds only row-local array expressions to the
    stage-5 stream; stage 7 adds one vocab-sized groupBy whose result
    broadcasts back — the funnel stays scan → flags → two bounded
    shuffles regardless of corpus size."""
    # Flags + repetition gate, persisted ONCE per (session, sf_dir) —
    # an unkeyed per-invocation persist leaked a cached copy per run
    # (round-4 review finding).
    doc_key = (spark.sparkContext.applicationId, sf_dir, "j24b_doc")
    doc = _J3_SHINGLE_CACHE.get(doc_key)
    if doc is None:
        flags = _j24_flags(spark, sf_dir)
        non_survivors = _j24_non_survivors(spark, sf_dir, flags)
        ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
        doc = (
            flags.join(non_survivors, "doc_id", "left")
            .withColumn("n", F.col("e") & F.col("__dup").isNull())
            .withColumn("__ws", ws_tokens)
        )
        words = F.split(F.col("text"), " ")
        g2 = F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        )
        dup2 = 1 - F.size(F.array_distinct(g2)).cast("double") / F.size(g2)
        topw = F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda d_: F.size(F.filter(words, lambda w: w == d_)),
            )
        ).cast("double") / F.size(words)
        doc = doc.withColumn(
            "r", F.col("n") & (dup2 <= 0.051) & (topw <= 0.11)
        ).persist()
        _J3_SHINGLE_CACHE[doc_key] = doc

    # Unigram LM fit on the stage-6 survivors, broadcast back to score
    # the same docs (rounded per-token log-probs -> exact int64 sums).
    toks = doc.filter(F.col("r")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tv = counts.agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("v"))
    lp = counts.crossJoin(F.broadcast(tv)).select(
        "tok",
        F.round(F.log((F.col("c") + 1.0) / (F.col("total") + F.col("v"))) * 1000000)
        .cast("long")
        .alias("lnp6"),
    )
    scored = (
        toks.join(F.broadcast(lp), "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__nt"), F.sum("lnp6").alias("__s"))
    )
    doc = doc.join(scored, "doc_id", "left").withColumn(
        "m",
        F.col("r")
        & (-F.col("__s") / 1000000.0 / F.col("__nt") <= 3.409),
    )
    wide = doc.agg(
        F.count("*").alias("c1"), F.sum("__ws").alias("t1"),
        F.sum(F.when(F.col("q"), 1).otherwise(0)).alias("c2"),
        F.sum(F.when(F.col("q"), F.col("__ws"))).alias("t2"),
        F.sum(F.when(F.col("l"), 1).otherwise(0)).alias("c3"),
        F.sum(F.when(F.col("l"), F.col("__ws"))).alias("t3"),
        F.sum(F.when(F.col("e"), 1).otherwise(0)).alias("c4"),
        F.sum(F.when(F.col("e"), F.col("__ws"))).alias("t4"),
        F.sum(F.when(F.col("n"), 1).otherwise(0)).alias("c5"),
        F.sum(F.when(F.col("n"), F.col("__ws"))).alias("t5"),
        F.sum(F.when(F.col("r"), 1).otherwise(0)).alias("c6"),
        F.sum(F.when(F.col("r"), F.col("__ws"))).alias("t6"),
        F.sum(F.when(F.col("m"), 1).otherwise(0)).alias("c7"),
        F.sum(F.when(F.col("m"), F.col("__ws"))).alias("t7"),
    )
    return wide.selectExpr(
        "stack(7, '1_raw', c1, t1, '2_quality', c2, t2, '3_lang', c3, t3, "
        "'4_exact_dedup', c4, t4, '5_near_dedup', c5, t5, "
        "'6_repetition', c6, t6, '7_lm_quality', c7, t7) "
        "AS (stage, n_docs, n_ws_tokens)"
    )


@register(
    "j31_sequence_packing",
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT CAST((cum - n_tok) // 512 AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1
""",
)
def j31_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j31 (extension): sequence packing — the batching step of LLM
    training: docs concatenate in doc_id order into a token stream
    chunked every 512 tokens, and each doc is accounted to the chunk
    holding its FIRST token (docs crossing a boundary continue into the
    next sequence, as packed training does).  The assignment is a pure
    prefix sum: chunk = (cumulative_tokens_before_doc) div 512.

    Scale: the global ordered prefix sum is computed as a TWO-PASS
    distributed prefix sum (see ``sequence_packing``) — per-bucket
    partial sums in parallel, then a P-row offset table folded back by
    broadcast join.  No single-partition window ever sees the corpus;
    everything after is a groupBy on the chunk id.

    Delegates to ``sequence_packing``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    return sequence_packing(d, seq_len=512)


def sequence_packing(
    docs: DataFrame, seq_len: int = 512, n_buckets: int | None = None
) -> DataFrame:
    """j31's engine, parameterized: pack ``docs`` (doc_id, n_tok) in
    doc_id order into ``seq_len``-token chunks; each doc is accounted
    to the chunk holding its first token.

    The prefix sum is DISTRIBUTED (the classic two-pass scan), never a
    single-partition global window (round-7 review: the previous
    ``Window.orderBy`` with no partitionBy pulled every row onto one
    task — correct, but a one-task bottleneck at scale):

    1. bucket every row by doc_id range — bucket boundaries come from
       one (min, max) aggregate, so bucketing is DETERMINISTIC and
       order-preserving (bucket i's ids all precede bucket i+1's; no
       sampling-based range exchange whose boundaries could differ
       between plan branches);
    2. within-bucket prefix sums via a window PARTITIONED by bucket
       (parallel across buckets — the plan-shape test pins the
       non-empty partition spec);
    3. per-bucket totals (≤ ``n_buckets`` rows) get running offsets
       via a window over the TINY totals table — P rows on one task,
       not the corpus — and fold back with a broadcast join.

    Skew caveat: buckets are doc_id-range-uniform, so a pathologically
    clustered id space degrades toward fewer effective buckets; ids
    here (and in most ingest layouts) are dense.  At 100 TB, replace
    step 1 with repartitionByRange + checkpoint (boundaries pinned by
    materialization) and keep steps 2-3 unchanged."""
    from pyspark.sql import Window
    from pyspark.sql.types import IntegralType

    # Range bucketing does integer arithmetic on doc_id, which narrows
    # this engine to INTEGRAL ids (the pre-round-8 global-window form
    # accepted any orderable type).  Fail loudly rather than misbucket
    # (ADVICE r8): non-integral ids should be ranked or cast upstream.
    id_type = docs.schema["doc_id"].dataType
    if not isinstance(id_type, IntegralType):
        raise TypeError(
            "sequence_packing requires an integral doc_id for distributed "
            f"range bucketing; got {id_type.simpleString()} — cast the id or "
            "derive a dense integer rank first"
        )
    spark = docs.sparkSession
    nb = int(n_buckets or spark.sparkContext.defaultParallelism or 32)
    bounds = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    lo = bounds["lo"] if bounds["lo"] is not None else 0
    hi = bounds["hi"] if bounds["hi"] is not None else 0
    width = max(1, -(-(int(hi) - int(lo) + 1) // nb))  # ceil
    # `div` = exact integer division (a float `/` could misbucket a
    # boundary id once doc_id deltas pass 2^53).
    b = docs.withColumn("_bk", F.expr(f"(doc_id - {int(lo)}L) div {width}L"))
    w_in = (
        Window.partitionBy("_bk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = b.withColumn("_cum_in", F.sum("n_tok").over(w_in))
    totals = b.groupBy("_bk").agg(F.sum("n_tok").alias("_t"))
    w_off = Window.orderBy("_bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bk", F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off")
    )
    c = c.join(F.broadcast(offsets), "_bk").withColumn(
        "cum", F.col("_cum_in") + F.col("_off")
    )
    chunk = ((F.col("cum") - F.col("n_tok")) / seq_len).cast("long")
    return (
        c.withColumn("chunk_id", chunk)
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def heavy_hitters_routed(
    spark: SparkSession,
    sf_dir: str,
    dict_threshold: int = 200_000,
    force_route: str | None = None,
) -> DataFrame:
    """Routed heavy hitters (judge r4 item 6 / NEXT.md item f): ONE
    entry point that picks the exact path (j22 — full term groupBy,
    state ~ dictionary size) or the Count-Min path (j36 — fixed
    ≤1024-cell sketch) by ESTIMATED dictionary cardinality, which is
    the 100 TB-realistic shape: exact while the dictionary fits
    executor memory, sketch when it cannot.

    The routing estimate is deterministic and oracle-replayable: 20 ×
    the distinct-term count of the 5% document sample (doc_id % 20 = 0)
    — a bounded driver scalar, not a full-corpus COUNT DISTINCT (which
    would cost the very shuffle the sketch route exists to avoid).

    Sketch route mechanics: candidate terms come from the SAME sample
    (a ≥0.5%-support term appears in any 5% sample w.h.p.), their
    counts from the 4×256 CMS built in one (r, bucket)-keyed partial
    aggregate over the full stream, and the corpus total from sketch
    row r=0 (each CMS row's cells sum to the stream length) — so the
    full corpus is scanned ONCE and never shuffled by term.  Released
    columns are identical across routes (word, cnt, share, route);
    sketch counts are upper bounds, with the route column declaring
    the semantics."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(words_of()).alias("word"))
    sample = d.filter(F.col("doc_id") % 20 == 0).select(
        F.explode(words_of()).alias("word")
    )
    route = force_route
    if route is None:
        est_dict = 20 * sample.distinct().count()  # bounded driver scalar
        route = "exact" if est_dict <= dict_threshold else "sketch"
    if route == "exact":
        counts = toks.groupBy("word").agg(F.count("*").alias("cnt"))
        total = counts.agg(F.sum("cnt").alias("__n"))
        return (
            counts.join(F.broadcast(total))
            .filter(F.col("cnt") >= 0.005 * F.col("__n"))
            .select(
                "word",
                "cnt",
                F.round(F.col("cnt") / F.col("__n"), 6).alias("share"),
                F.lit("exact").alias("route"),
            )
        )

    def bucket(r, word_col):
        return hash31_md5(F.concat(F.lit(f"cm{r}|"), word_col)) % 256

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"), bucket(r, F.col("word")).alias("b")
                        )
                        for r in range(4)
                    ]
                )
            ).alias("rb")
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cell"))
        # The sketch is ≤1024 rows but feeds TWO consumers (probe join +
        # total); without materialization each consumer re-scans the full
        # corpus.  Checkpointing the tiny table makes the full scan happen
        # exactly once — the property test_j38_sketch_route_avoids_term_shuffle
        # pins.
        .localCheckpoint(eager=True)
    )
    total = cells.filter(F.col("r") == 0).agg(F.sum("cell").alias("__n"))
    probes = sample.distinct().select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("pr"), bucket(r, F.col("word")).alias("pb")
                    )
                    for r in range(4)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            F.broadcast(cells),
            (F.col("p.pr") == F.col("r")) & (F.col("p.pb") == F.col("b")),
        )
        .groupBy("word")
        .agg(F.min("cell").alias("est_n"))
    )
    return (
        est.join(F.broadcast(total))
        .filter(F.col("est_n") >= 0.005 * F.col("__n"))
        .select(
            "word",
            F.col("est_n").cast("long").alias("cnt"),
            F.round(F.col("est_n") / F.col("__n"), 6).alias("share"),
            F.lit("sketch").alias("route"),
        )
    )


_J38_SKETCH_REL = """
w AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
s AS (SELECT unnest(string_split(lower(text), ' ')) AS word
      FROM documents WHERE doc_id % 20 = 0),
dict AS (SELECT 20 * COUNT(DISTINCT word) AS est_dict FROM s),
total AS (SELECT COUNT(*) AS n FROM w),
exact_rel AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(COUNT(*) / (SELECT n FROM total), 6) AS share,
         'exact' AS route
  FROM w GROUP BY word
  HAVING COUNT(*) >= 0.005 * (SELECT n FROM total)
),
cells AS (
  SELECT r,
         (('0x' || substr(md5('cm' || r || '|' || word), 1, 15))::BIGINT
          % 2147483647) % 256 AS b,
         COUNT(*) AS cell
  FROM w, (SELECT unnest(range(4)) AS r) rs
  GROUP BY 1, 2
),
cand AS (SELECT DISTINCT word FROM s),
est AS (
  SELECT c.word, MIN(cells.cell) AS est_n
  FROM cand c JOIN cells
    ON cells.b = (('0x' || substr(md5('cm' || cells.r || '|' || c.word), 1, 15))::BIGINT
                  % 2147483647) % 256
  GROUP BY c.word
),
sketch_rel AS (
  SELECT word, CAST(est_n AS BIGINT) AS cnt,
         ROUND(est_n / (SELECT n FROM total), 6) AS share,
         'sketch' AS route
  FROM est WHERE est_n >= 0.005 * (SELECT n FROM total)
)
"""


@register(
    "j38_heavy_hitters_routed",
    # The oracle replays the ROUTE DECISION too: both release shapes are
    # defined, and the sample-estimated dictionary size guards which one
    # emits rows — so a Spark-side routing regression (wrong branch)
    # mismatches even if both branches are individually correct.
    oracle=f"""
WITH {_J38_SKETCH_REL}
SELECT * FROM exact_rel WHERE (SELECT est_dict FROM dict) <= 200000
UNION ALL
SELECT * FROM sketch_rel WHERE (SELECT est_dict FROM dict) > 200000
""",
)
def j38_heavy_hitters_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j38 (extension): see heavy_hitters_routed — exact-vs-CMS heavy
    hitters behind one cardinality-routed entry point."""
    return heavy_hitters_routed(spark, sf_dir)


# DuckDB replays of dp.hash_uniform(doc_id, salt) for the split/mixture ops —
# generated by the one canonical replay builder so the three expressions can
# never drift apart.
from ma_anonymization_etl_spark.operators.dp import _sql_uniform  # noqa: E402

_SQL_U39 = _sql_uniform("doc_id", "split39|")
_SQL_U40 = _sql_uniform("d.doc_id", "mix40|")


@register(
    "j39_train_test_split",
    oracle=f"""
WITH d AS (
  SELECT source, n_chars,
         CASE WHEN {_SQL_U39} < 0.8 THEN 'train'
              WHEN {_SQL_U39} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       ROUND(COUNT(*) / SUM(COUNT(*)) OVER (), 6) AS corpus_share
FROM d GROUP BY split, source
""",
)
def j39_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j39 (extension): deterministic hash-based train/val/test split —
    the reproducibility primitive of every training-data pipeline: each
    doc routes to a split by a salted md5-uniform of its id (80/10/10),
    so membership is a pure function of (salt, doc_id): stable across
    runs, engines, and repartitions, with no sampling state and no
    shuffle (assignment is map-side; only the audit agg shuffles tiny
    (split, source) groups).  Released: the split × source audit table
    (doc and char counts + corpus share) a pipeline publishes to prove
    split balance.  The oracle replays every assignment.

    Delegates to ``split_assign`` + ``split_audit``."""
    d = load(spark, sf_dir, "documents")
    assigned = split_assign(
        d, "doc_id", salt="split39|", fractions=(("train", 0.8), ("val", 0.9))
    )
    return split_audit(assigned, "source")


def split_assign(
    df: DataFrame,
    id_col: str,
    salt: str = "split|",
    fractions=(("train", 0.8), ("val", 0.9)),
    rest: str = "test",
) -> DataFrame:
    """j39's assignment, parameterized: adds a ``split`` column from a
    salted md5-uniform of ``id_col`` — each (name, upper_bound) in
    ``fractions`` claims u < bound in order, the remainder is ``rest``.
    Pure map-side; membership is a function of (salt, id)."""
    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    u = hash_uniform(F.col(id_col), salt)
    expr = None
    for name, bound in fractions:
        expr = (
            F.when(u < bound, name)
            if expr is None
            else expr.when(u < bound, name)
        )
    return df.withColumn("split", expr.otherwise(rest))


def split_audit(assigned: DataFrame, by: str, size_col: str = "n_chars") -> DataFrame:
    """j39's release: the split × ``by`` audit table (doc and size
    counts + corpus share) a pipeline publishes to prove balance.
    ``size_col`` is the per-row size to total (default n_chars);
    tables without one get n_docs as the size so the audit still runs
    on any (split, by) assignment."""
    from pyspark.sql import Window

    size = F.col(size_col) if size_col in assigned.columns else F.lit(1)
    # Share denominator = sum over the tiny audit table itself (an
    # unbounded window over ~|splits × by| rows) — no second corpus
    # pass for a number the aggregate already knows.
    return (
        assigned.groupBy("split", by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size).cast("long").alias("n_chars_total"),
        )
        .select(
            "split",
            by,
            "n_docs",
            "n_chars_total",
            F.round(
                F.col("n_docs")
                / F.sum("n_docs").over(Window.partitionBy()),
                6,
            ).alias("corpus_share"),
        )
    )


@register(
    "j40_mixture_sample",
    # Temperature-weighted source mixing (alpha = 0.5).  Quota
    # arithmetic runs in IEEE DOUBLE with one fixed operation order —
    # ((0.5 * N) * w_s) / denom, floored — which both engines evaluate
    # bit-identically AND which cannot overflow at any corpus size
    # (an int64 product (N/2)*w_s would wrap around ~2e9 docs — the
    # same defect class as i38's old synth_id stride).  w_s =
    # floor(sqrt(n_s)*1e6) keeps 6 significant digits of the
    # temperature weight; keep iff md5-uniform(doc_id) < quota_s/n_s
    # (again one IEEE division per engine — identical).
    oracle=f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_source,
         CAST(FLOOR(SQRT(COUNT(*)) * 1000000.0) AS BIGINT) AS w
  FROM documents GROUP BY source
),
t AS (SELECT SUM(n_source) AS n_total, SUM(w) AS denom FROM c),
q AS (
  SELECT source, n_source,
         CAST(FLOOR(((0.5 * CAST(t.n_total AS DOUBLE)) * CAST(w AS DOUBLE))
                    / CAST(t.denom AS DOUBLE)) AS BIGINT) AS quota
  FROM c CROSS JOIN t
),
kept AS (
  SELECT d.source, COUNT(*) AS n_kept
  FROM documents d JOIN q ON q.source = d.source
  WHERE {_SQL_U40} < CAST(quota AS DOUBLE) / n_source
  GROUP BY d.source
)
SELECT q.source, CAST(q.n_source AS BIGINT) AS n_source, q.quota,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       ROUND(COALESCE(k.n_kept, 0) / CAST(q.n_source AS DOUBLE), 6) AS kept_rate
FROM q LEFT JOIN kept k ON k.source = q.source
""",
)
def j40_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j40 (extension): TRAINING-MIXTURE sampling — temperature-based
    source re-weighting (the multilingual/multi-domain standard: sample
    source s proportional to n_s^alpha, alpha = 0.5, so small sources
    are up-weighted relative to their raw share) down to a 50% target
    corpus.  Per-source quotas come from exact integer arithmetic over
    the tiny source-count table; each doc keeps or drops by comparing
    its salted md5-uniform to its source's quota rate — a broadcast
    join + map-side filter.  The corpus is read in TWO linear passes
    (you cannot route without counting first): one partial-aggregated
    count pass builds the O(sources) routing table, then the keep/drop
    pass streams through the scan; neither pass shuffles the corpus
    (only the per-source audit agg shuffles |sources| rows).
    Released: the per-source audit (population, quota, kept, rate).
    Every keep/drop decision is oracle-replayed.

    Scale: the routing table is O(sources) and broadcast; both data
    passes are embarrassingly parallel, and nothing in the plan grows
    with corpus size beyond those two scans (in a real pipeline the
    source counts usually come free from catalog statistics, collapsing
    this to one pass).

    Delegates to ``mixture_sample``."""
    d = load(spark, sf_dir, "documents")
    return mixture_sample(
        d, "source", "doc_id", target_frac=0.5, salt="mix40|"
    )


def mixture_sample(
    docs: DataFrame,
    source_col: str,
    id_col: str,
    target_frac: float = 0.5,
    salt: str = "mix|",
) -> DataFrame:
    """j40's engine, parameterized: temperature-based (alpha = 0.5)
    source re-weighting down to a ``target_frac`` corpus — per-source
    quotas from exact arithmetic over the tiny source-count table,
    keep/drop by comparing each row's salted md5-uniform of ``id_col``
    to its source's quota rate.  Returns the per-source audit
    (n_source, quota, n_kept, kept_rate)."""
    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    c = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source")).withColumn(
        "w", F.floor(F.sqrt(F.col("n_source")) * 1000000.0).cast("long")
    )
    t = c.agg(F.sum("n_source").alias("n_total"), F.sum("w").alias("denom"))
    q = (
        c.crossJoin(F.broadcast(t))
        .select(
            source_col,
            "n_source",
            # Same IEEE-double op order as the oracle: ((f*N)*w)/denom,
            # floored — cross-engine identical, overflow-free at any N.
            F.floor(
                (F.lit(float(target_frac)) * F.col("n_total").cast("double"))
                * F.col("w").cast("double")
                / F.col("denom").cast("double")
            ).cast("long").alias("quota"),
        )
        .localCheckpoint(eager=True)  # tiny routing table, reused twice
    )
    u = hash_uniform(F.col(id_col), salt)
    kept = (
        docs.select(id_col, source_col)
        .join(F.broadcast(q), source_col)
        .filter(u < F.col("quota").cast("double") / F.col("n_source"))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        q.join(kept, source_col, "left")
        .select(
            source_col,
            F.col("n_source").cast("long").alias("n_source"),
            "quota",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round(
                F.coalesce(F.col("n_kept"), F.lit(0))
                / F.col("n_source").cast("double"),
                6,
            ).alias("kept_rate"),
        )
    )


@register(
    "j41_doc_chunking",
    # C=64-token chunks, stride S=48 (16-token overlap) — every token
    # covered exactly once by some chunk END: the last chunk index is
    # ceil((n-C)/S) (0 when n <= C), so a chunk is emitted only when it
    # extends coverage — never a trailing chunk fully contained in its
    # predecessor (n mod S in [1, C-S] used to produce one).
    oracle="""
WITH d AS (
  SELECT doc_id, string_split(lower(text), ' ') AS w,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * 48 + 1 AS BIGINT) AS start_tok,
       CAST(LEAST(64, n - i * 48) AS BIGINT) AS n_tok,
       array_to_string(list_slice(w, i * 48 + 1, LEAST(i * 48 + 64, n)), ' ')
         AS chunk_text
FROM d, LATERAL (SELECT unnest(range(0, GREATEST(0, (n - 64 + 47) // 48) + 1)) AS i) s
""",
)
def j41_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j41 (extension): overlapping-window DOCUMENT CHUNKING — the
    context-window packing/RAG-indexing primitive: each doc becomes
    1 + max(0, ceil((n−C)/S)) chunks of up to C=64 tokens at stride
    S=48 (16-token overlap so no boundary-spanning phrase is lost; a
    chunk is emitted only when it extends coverage, so no trailing
    chunk is ever a subset of its predecessor).  Fully declarative
    (split → sequence → explode → slice/concat inside codegen, no
    Python) and purely map-side: zero shuffles, output size ≈ C/S ×
    corpus — the shape that holds at 100 TB where chunking must stream
    through the scan.  The oracle replays every chunk boundary and the
    chunk text itself."""
    C, S = 64, 48
    d = load(spark, sf_dir, "documents").select(
        "doc_id", words_of().alias("w")
    ).withColumn("n", F.size("w").cast("long"))
    return (
        d.select(
            "doc_id",
            "n",
            "w",
            F.explode(
                F.expr(f"sequence(0L, greatest(0L, (n - {C} + {S - 1}) div {S}))")
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * S + 1).alias("start_tok"),
            F.least(F.lit(C).cast("long"), F.col("n") - F.col("chunk_idx") * S).alias(
                "n_tok"
            ),
            F.concat_ws(
                " ",
                F.expr(f"slice(w, cast(chunk_idx * {S} + 1 as int), {C})"),
            ).alias("chunk_text"),
        )
    )


def _bpe_merge_round(wcol: Column, a: str, b: str, m: str) -> Column:
    """Apply merge rule (a, b) -> m positionally in parallel over a
    symbol list: drop every b whose predecessor is a, rewrite every a
    whose successor is b.  Correct for a != b (no merge chains are
    possible: a consumed b can never start another (a, b) pair), which
    is exactly why j42 restricts argmax to non-self pairs — classic
    BPE's self-pair merge is an inherently sequential per-word fold.
    All neighbor probes sit inside F.when so no out-of-range
    element_at is ever evaluated (Spark 4 ANSI throws on index 0)."""
    n = F.size(wcol)
    at = lambda i: F.element_at(wcol, i.cast("int"))  # noqa: E731
    prev = lambda i: F.when(i > 1, F.element_at(wcol, (i - 1).cast("int")))  # noqa: E731
    nxt = lambda i: F.when(i < n, F.element_at(wcol, (i + 1).cast("int")))  # noqa: E731
    kept = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: ~((at(i) == b) & prev(i).eqNullSafe(F.lit(a))),
    )
    return F.transform(
        kept,
        lambda i: F.when(
            (at(i) == a) & nxt(i).eqNullSafe(F.lit(b)), F.lit(m)
        ).otherwise(at(i)),
    )


_BPE_ROUNDS = 8  # merge rounds learned by j42 and applied by j47 —
# both DuckDB oracle generators unroll the same constant, so changing
# it re-derives engine and oracle together.


def _bpe_fit(cur: DataFrame, rounds: int = _BPE_ROUNDS):
    """Run the bounded BPE merge-learning loop over a symbol-list table
    ``cur`` carrying at least (cnt, w) — extra columns (e.g. the word
    key j47 joins back on) ride along untouched.  Per round: one
    weighted non-self pair aggregate, one bounded driver argmax
    (count desc, a, b), one positionally-parallel rewrite.  Returns
    (final table, [(round, a, b, merged, n_weighted)])."""
    rules = []
    for rnd in range(1, rounds + 1):
        pair_idx = F.when(
            F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = (
            cur.select("cnt", F.explode(pair_idx).alias("i"), "w")
            .select(
                F.element_at("w", F.col("i").cast("int")).alias("a"),
                F.element_at("w", (F.col("i") + 1).cast("int")).alias("b"),
                "cnt",
            )
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()[0]
        rules.append((rnd, top["a"], top["b"], top["a"] + top["b"], int(top["n"])))
        cur = cur.withColumn(
            "w", _bpe_merge_round(F.col("w"), top["a"], top["b"], top["a"] + top["b"])
        ).localCheckpoint(eager=True)
    return cur, rules


def _j42_oracle() -> str:
    """_BPE_ROUNDS unrolled BPE rounds in DuckDB: per round, weighted
    non-self adjacent-pair counts over the current symbol lists, argmax
    with (count desc, a, b) tie-break, positional merge via
    list_filter/list_transform capturing the 1-row argmax CTE."""
    rounds = []
    prev = "s0"
    for r in range(1, _BPE_ROUNDS + 1):
        rounds.append(f"""
p{r} AS (
  SELECT w[i] AS a, w[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM {prev}, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
  WHERE w[i] <> w[i + 1]
  GROUP BY 1, 2
),
m{r} AS (SELECT a, b, a || b AS m, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1),
s{r} AS (
  SELECT cnt,
         list_transform(
           list_filter(range(1, len(w) + 1),
                       i -> NOT (w[i] = m{r}.b AND i > 1 AND w[i - 1] = m{r}.a)),
           i -> CASE WHEN w[i] = m{r}.a AND i < len(w) AND w[i + 1] = m{r}.b
                     THEN m{r}.m ELSE w[i] END) AS w
  FROM {prev} CROSS JOIN m{r}
)""")
        prev = f"s{r}"
    chain = ",".join(rounds)
    return f"""
WITH types AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
  GROUP BY word
),
s0 AS (
  SELECT cnt,
         list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS w
  FROM types
),
{chain}
{" UNION ALL ".join(
    f"SELECT CAST({r} AS INTEGER) AS round, a AS left_sym, b AS right_sym, "
    f"m AS merged, n AS n_weighted FROM m{r}" for r in range(1, _BPE_ROUNDS + 1))}
"""


@register("j42_bpe_vocab_induction", oracle=_j42_oracle())
def j42_bpe_vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j42 (extension): BPE VOCABULARY INDUCTION (Sennrich et al. 2016)
    — the tokenizer-training step of an LLM data pipeline: starting
    from characters, repeatedly merge the corpus's most frequent
    adjacent symbol pair (weighted by word frequency), releasing the
    learned merge table (round, pair, merged symbol, weighted count).

    Variant documented honestly: argmax is restricted to NON-SELF
    pairs (a != b), which makes every merge positionally parallel —
    all occurrences rewrite simultaneously, identically on both
    engines — where classic BPE's self-pair merge ('aa') is a
    sequential left-to-right fold per word that no set-oriented engine
    replays cheaply.  Tie-break (count desc, a, b) pins the argmax.

    Scale: the ONE corpus-sized operation is the word-frequency
    groupBy (j4's shape); every merge round then iterates over the
    TYPE table (vocab-sized, ~1k rows here, millions at web scale —
    still executor-trivial), exactly how production BPE trainers work.
    Per round: one pair-count aggregate over types, one bounded
    driver-side argmax (the i18/Mondrian discipline), one map-side
    list rewrite."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(words_of()).alias("word")
    )
    types = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    cur = types.select(
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("w"),
    ).localCheckpoint(eager=True)
    cur, rules = _bpe_fit(cur)
    return spark.createDataFrame(
        rules,
        "round INT, left_sym STRING, right_sym STRING, merged STRING, n_weighted LONG",
    )


_J45_ALPHA = 0.4  # global target sampling fraction


@register(
    "j45_balance_resample",
    oracle=f"""
WITH s AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
t AS (SELECT COUNT(*) AS n_total, COUNT(DISTINCT lang) AS n_langs FROM documents)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_sql_uniform('d.doc_id', 'j45')} <
                          {_J45_ALPHA} * CAST(n_total AS DOUBLE)
                          / (CAST(n_langs AS DOUBLE) * CAST(n_lang AS DOUBLE))
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
FROM documents d JOIN s ON s.lang = d.lang, t
GROUP BY d.lang
""",
)
def j45_balance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j45 (extension): distribution-matching importance resampling —
    the DSIR-shaped corpus rebalancer (arXiv:2302.03169's acceptance
    form on a categorical feature): each document is kept with
    probability proportional to p_target(lang)/p_source(lang) (target
    = uniform over languages, alpha = 0.4 global rate), so the sampled
    corpus approaches the target language mix without a global sort or
    per-group reservoir.  The accept draw is the md5-derived U[0,1)
    keyed on doc_id, so the DuckDB oracle replays every accept
    decision exactly.

    100 TB shape: one aggregate for the source distribution (a
    langs-sized broadcast), then ONE map-side pass computes the accept
    flag per row — no shuffle of the corpus, no reservoir state; the
    same two-step works for any categorical target (domain, source,
    quality bucket).

    Delegates to ``balance_resample``."""
    d = load(spark, sf_dir, "documents")
    return balance_resample(d, "lang", "doc_id", alpha=_J45_ALPHA, salt="j45")


def balance_resample(
    docs: DataFrame,
    feature_col: str,
    id_col: str,
    alpha: float = 0.4,
    salt: str = "j45",
) -> DataFrame:
    """j45's engine, parameterized: DSIR-shaped acceptance resampling
    toward a UNIFORM target over ``feature_col`` categories at global
    rate ``alpha`` — accept iff the salted md5-uniform of ``id_col``
    falls under alpha * N / (|categories| * n_category).  Returns the
    per-category audit (n_docs, n_sampled)."""
    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    s = docs.groupBy(feature_col).agg(F.count(F.lit(1)).alias("n_lang"))
    t = docs.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.countDistinct(feature_col).alias("n_langs"),
    )
    thr = (
        F.lit(float(alpha))
        * F.col("n_total").cast("double")
        / (F.col("n_langs").cast("double") * F.col("n_lang").cast("double"))
    )
    return (
        docs.join(F.broadcast(s), feature_col)
        .crossJoin(F.broadcast(t))
        .withColumn("acc", (hash_uniform(id_col, salt) < thr).cast("long"))
        .groupBy(feature_col)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("acc").alias("n_sampled"))
    )


@register(
    "j46_group_sample_exact_k",
    oracle="""
SELECT source, doc_id, CAST(rk AS BIGINT) AS rk FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5('j46' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rk
  FROM documents
) WHERE rk <= 5
""",
)
def j46_group_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j46 (extension): EXACTLY-k-per-group sampling via deterministic
    priority — each row's priority is its md5 digest (keyed on doc_id),
    so rank-<=-k per group is a uniform without-replacement sample of
    exactly min(k, n) rows that any engine (and any re-run) reproduces
    bit-for-bit.  Complements j18 (Bernoulli hash sample — random SIZE)
    and j19 (stratified fractions): eval sets and human-review batches
    need exact counts.

    100 TB shape: one shuffle on the group key; per group the
    TakeOrderedAndProject-style top-k over the priority needs no full
    sort of the corpus (window + filter prunes at the partial level
    under AQE; for pathological single-group skew route via f4's
    two-phase top-k instead).

    Delegates to ``group_sample_exact_k``."""
    d = load(spark, sf_dir, "documents")
    return group_sample_exact_k(d, "source", "doc_id", k=5, salt="j46")


def group_sample_exact_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 5,
    salt: str = "j46",
    project: bool = True,
) -> DataFrame:
    """j46's engine, parameterized: exactly min(k, n) rows per group by
    deterministic md5 priority of ``id_col`` — a uniform
    without-replacement sample any engine and re-run reproduces.
    ``project=False`` keeps every input column (the route-step form)
    instead of projecting to (group, id, rk)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.col(id_col)
    )
    ranked = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    if not project:
        return ranked.drop("rk")
    return ranked.select(group_col, id_col, F.col("rk").cast("long").alias("rk"))


def _j47_oracle() -> str:
    """j42's _BPE_ROUNDS-round merge chain, but carrying the word key so the
    final symbol lists can be joined back onto documents (the encode
    side)."""
    rounds = []
    prev = "s0"
    for r in range(1, _BPE_ROUNDS + 1):
        rounds.append(f"""
p{r} AS (
  SELECT w[i] AS a, w[i + 1] AS b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM {prev}, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
  WHERE w[i] <> w[i + 1]
  GROUP BY 1, 2
),
m{r} AS (SELECT a, b, a || b AS m, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1),
s{r} AS (
  SELECT word, cnt,
         list_transform(
           list_filter(range(1, len(w) + 1),
                       i -> NOT (w[i] = m{r}.b AND i > 1 AND w[i - 1] = m{r}.a)),
           i -> CASE WHEN w[i] = m{r}.a AND i < len(w) AND w[i + 1] = m{r}.b
                     THEN m{r}.m ELSE w[i] END) AS w
  FROM {prev} CROSS JOIN m{r}
)""")
        prev = f"s{r}"
    return f"""
WITH docs AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents
),
types AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM docs GROUP BY word),
s0 AS (
  SELECT word, cnt,
         list_transform(range(1, len(word) + 1), i -> substr(word, i, 1)) AS w
  FROM types
),
{",".join(rounds)},
enc AS (SELECT word, len(w) AS n_bpe FROM s{_BPE_ROUNDS})
SELECT d.doc_id,
       CAST(SUM(length(d.word)) AS BIGINT) AS n_char_syms,
       CAST(SUM(e.n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(length(d.word)) - SUM(e.n_bpe) AS BIGINT) AS n_saved
FROM docs d JOIN enc e ON e.word = d.word
GROUP BY d.doc_id
"""


@register("j47_bpe_encode", oracle=_j47_oracle())
def j47_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j47 (extension): BPE ENCODE — the apply side of j42's learned
    merge table, done the way production tokenizers amortize it: the
    learned merges are applied once per word TYPE (vocab-sized
    table), then
    the encoded lengths JOIN back onto the token stream (broadcast —
    the type table is tiny next to the corpus), so no document is ever
    re-folded.  Output per doc: initial character-symbol count, BPE
    token count after the _BPE_ROUNDS merges, and symbols saved — the
    compression-accounting a tokenizer-budget planner consumes.

    Scale: learning is j42's bounded loop; ENCODING adds one
    vocab-sized broadcast join + one doc-keyed aggregate over the
    already-exploded token stream — the same single-shuffle profile as
    j4's word count.  Nothing per-document is iterative."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words_of()).alias("word")).localCheckpoint(
        eager=True
    )  # read twice: the types aggregate and the final encode join
    types = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    cur = types.select(
        "word",
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("w"),
    ).localCheckpoint(eager=True)
    final, _rules = _bpe_fit(cur)
    enc = final.select("word", F.size("w").cast("long").alias("n_bpe"))
    return (
        toks.join(F.broadcast(enc), "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.length("word").cast("long")).alias("n_char_syms"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
            (
                F.sum(F.length("word").cast("long")) - F.sum("n_bpe")
            ).alias("n_saved"),
        )
    )


@register(
    "j48_bigram_lm_score",
    # Same micro-nat discipline as j30: per-bigram log-probs rounded to
    # 6 dp BEFORE the scaled-int64 sum, so per-doc accumulation is
    # order-independent and engine-identical.
    oracle="""
WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b
       FROM w, LATERAL (SELECT unnest(range(1, len(toks))) AS i) t),
c2 AS (SELECT a, b, COUNT(*) AS c FROM bg GROUP BY a, b),
ctx AS (SELECT a, COUNT(*) AS ctx FROM bg GROUP BY a),
v AS (SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents)),
lp AS (SELECT c2.a, c2.b,
              CAST(ROUND(ln((c2.c + 1.0) / (ctx.ctx + v.v)) * 1000000) AS BIGINT)
                AS lnp6
       FROM c2 JOIN ctx ON ctx.a = c2.a, v),
d AS (SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(lnp6) AS BIGINT) AS s
      FROM bg JOIN lp ON lp.a = bg.a AND lp.b = bg.b GROUP BY doc_id)
SELECT doc_id, n_bigrams,
       ((-s) // n_bigrams) / 1000000.0 AS avg_nll,
       ((-s) // n_bigrams) <= 3390000 AS keep
FROM d
""",
)
def j48_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j48 (extension): BIGRAM LM quality scoring — j30's unigram
    filter upgraded one Markov order: Laplace-smoothed P(b|a) =
    (c(a,b)+1)/(c(a·)+V) trained on the corpus itself, per-doc average
    NLL in exact micro-nats (per-bigram log-probs rounded to 6 dp,
    then an order-independent int64 sum — no float accumulation
    drift), keep-threshold at the corpus median (3.39 nats).  Bigram
    scores catch word-salad documents whose unigram profile looks
    normal — the CCNet/Gopher-style fluency signal.

    Scale: the bigram stream is a map-side zip of adjacent tokens (no
    self-join on position); the model is two groupBys (bigram counts,
    context counts); scoring joins the stream against the model on
    (a, b) — at 100 TB hash-partition the model by its first token so
    stream and model co-shuffle once, and cap the model to top-M
    bigrams with a default-backoff row exactly like production CCNet
    filters."""
    d = load(spark, sf_dir, "documents").select("doc_id", words_of().alias("toks"))
    n = F.size("toks")
    bg = d.select(
        "doc_id",
        F.explode(
            F.when(
                n >= 2,
                F.arrays_zip(
                    F.slice("toks", 1, n - 1).alias("a"),
                    F.slice("toks", 2, n - 1).alias("b"),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    # bg feeds three subtrees (bigram counts, context counts, the scoring
    # join) — checkpoint so the split+zip+explode runs once, not thrice.
    bg = bg.localCheckpoint(eager=True)
    c2 = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ctx = bg.groupBy("a").agg(F.count(F.lit(1)).alias("ctx"))
    v = d.select(F.explode("toks").alias("tok")).agg(
        F.countDistinct("tok").alias("v")
    )
    lp = (
        c2.join(ctx, "a")
        .crossJoin(F.broadcast(v))
        .select(
            "a",
            "b",
            F.round(
                F.log((F.col("c") + F.lit(1.0)) / (F.col("ctx") + F.col("v"))) * 1e6
            )
            .cast("long")
            .alias("lnp6"),
        )
    )
    per_doc = (
        bg.join(lp, ["a", "b"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lnp6").alias("s"))
    )
    nll6 = F.floor((-F.col("s")) / F.col("n_bigrams")).cast("long")
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        (nll6 / 1e6).alias("avg_nll"),
        (nll6 <= F.lit(3390000)).alias("keep"),
    )


@register(
    "j49_domain_quota",
    oracle="""
WITH u AS (
  SELECT doc_id, source || '.example.com' AS host FROM documents
),
r AS (
  SELECT host, doc_id,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY md5('j49' || CAST(doc_id AS VARCHAR)),
                                     doc_id) AS rk
  FROM u
)
SELECT host,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rk > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
FROM r GROUP BY host
""",
)
def j49_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j49 (extension): PER-DOMAIN quota capping — the Common-Crawl-style
    guard against any single site dominating the corpus: documents are
    keyed by host (h10's parse_url surface; here the deterministic
    per-doc host), ranked within each host by md5 priority (j46's
    uniform without-replacement order), and at most Q=10 survive per
    host.  Released accounting per host: total, kept, capped — the
    dashboard row a crawl-curation run publishes.

    Scale: one shuffle on host; within-host ranking prunes at the
    partial level (WindowGroupLimit); the md5 priority makes the KEPT
    SET — not just the count — deterministic and replayable, so
    re-crawls keep the same survivors and downstream dedup stays
    stable.

    Delegates to ``domain_quota_audit``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("source"), F.lit(".example.com")).alias("host")
    )
    return domain_quota_audit(d, "host", "doc_id", quota=10, salt="j49")


def domain_quota_audit(
    df: DataFrame, host_col: str, id_col: str, quota: int = 10, salt: str = "j49"
) -> DataFrame:
    """j49's engine, parameterized: rank rows within each ``host_col``
    by md5 priority of ``id_col`` and cap survivors at ``quota``;
    releases per-host (n_docs, n_kept, n_capped).  The kept SET is
    deterministic — filter rk <= quota on the same window to
    materialize it."""
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), F.col(id_col)
    )
    r = df.withColumn("rk", F.row_number().over(w))
    return r.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("rk") <= quota).cast("long")).alias("n_kept"),
        F.sum((F.col("rk") > quota).cast("long")).alias("n_capped"),
    )


# ---------------------------------------------------------------------------
# j50: EXACT set-similarity join (prefix filtering) — the deterministic
# complement to j3's probabilistic MinHash-LSH.
# ---------------------------------------------------------------------------


def _ordered_tokens(
    toks: DataFrame,
    id_col: str,
    tok_col: str,
    assume_distinct: bool = False,
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Normalize+distinct the (doc_id, tok) table and build the per-doc
    GLOBAL-ORDER token array: every doc's tokens sorted by (document
    frequency asc, token asc) — realized as a per-row array_sort of
    (df, tok) structs, never a vocabulary-wide rank window.  Returns
    (toks, per_doc) with per_doc = (doc_id, ord_toks, sz); ord_toks
    elements carry (df, tok) so downstream consumers can cap by df
    without re-joining the frequency table.

    The distinct token table feeds several plan branches downstream.
    It is deliberately NOT persist()ed here: a per-call persist leaks
    one cached copy per invocation within a session (measured:
    GC-locker thrash by the third sf0.1 call in a 1 GB driver — the
    j43b lesson's cousin), and Catalyst already reuses the distinct's
    Exchange across branches.  On a real cluster, checkpoint the
    token table BEFORE calling when upstream tokenization is
    expensive.

    ``materialize=True`` (round 13) eagerly localCheckpoints per_doc:
    the exact-join engines consume it from THREE branches (prefix
    explode + both verify lookups), and the round-13 stage profile
    measured the un-cut form paying the df-join + per-doc groupBy once
    per branch with heavy block-read contention at 32 concurrent
    tasks (runTime 24 s vs 2-3 s CPU per branch).  Within-query cut,
    recomputed per invocation — never a cross-run cache.  Leave False
    on single-consumer paths (the routing estimate), where an eager
    materialization of a corpus-sized table buys nothing."""
    toks = toks.select(F.col(id_col).alias("doc_id"), F.col(tok_col).alias("tok"))
    if not assume_distinct:
        toks = toks.distinct()
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("ord_toks"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    if materialize:
        per_doc = per_doc.localCheckpoint(eager=True)
    return toks, per_doc


def _explode_prefix(per_doc: DataFrame, threshold: float) -> DataFrame:
    """Explode ``per_doc``'s global-order arrays to the per-doc PREFIX
    rows (doc_id, sz, pos, tok, df) — each doc's first
    |t| − ⌈threshold·|t|⌉ + 1 (i.e., RAREST) tokens."""
    pref_len = (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int")
    return per_doc.select(
        "doc_id",
        "sz",
        F.posexplode(F.slice("ord_toks", F.lit(1), pref_len)).alias("p0", "p"),
    ).select(
        "doc_id",
        "sz",
        (F.col("p0") + 1).alias("pos"),
        F.col("p.tok").alias("tok"),
        F.col("p.df").alias("df"),
    )


def _hashed_token_arrays(per_doc: DataFrame) -> DataFrame:
    """Verify-lookup table (doc_id, ts ARRAY<BIGINT>) with each token
    replaced by its xxhash64 — the j56b hashed-key discipline applied
    to the exact-verify payload (guide §2.3, shuffle fewer bytes).

    Why sound: per-doc token sets are distinct, xxhash64 is a fixed
    deterministic function, so |hash(A) ∩ hash(B)| == |A ∩ B| unless
    two DISTINCT tokens in A ∪ B collide in 64 bits.  For |A∪B| ≤ 2^k
    tokens the per-pair bound is C(2^k, 2)·2⁻⁶⁴; at this family's
    shapes (|A∪B| ~ 10²) that is ~3e-16 per pair, ~2e-10 per 10⁶
    candidates per run — the j56b-style written trade (failure mode:
    one intersection count off by one).  Property-pinned bit-identical
    to the string-array verify on the gate corpora in
    tests/test_new_ops_props.py."""
    return per_doc.select(
        "doc_id",
        F.transform("ord_toks", lambda s: F.xxhash64(s["tok"])).alias("ts"),
    )


def _prefix_index(
    toks: DataFrame,
    threshold: float,
    id_col: str,
    tok_col: str,
    assume_distinct: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared prefix-filter index for j50/j52: the ``_ordered_tokens``
    global order, exploded to each doc's first
    |t| − ⌈threshold·|t|⌉ + 1 (i.e., RAREST) tokens.

    Returns (toks, prefix) where prefix = (doc_id, sz, pos, tok, df) —
    ``pos`` is the token's 1-based position in the doc's global
    (df, tok) order, which is what PPJoin's positional filter needs;
    ``df`` rides along so the capped containment contract can filter
    without another frequency join."""
    toks, per_doc = _ordered_tokens(toks, id_col, tok_col, assume_distinct)
    return toks, _explode_prefix(per_doc, threshold)


def _ssj_candidates(
    toks: DataFrame,
    tau: float,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    positional: bool = True,
    assume_distinct: bool = False,
    prebuilt: tuple[DataFrame, DataFrame] | None = None,
    per_doc: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stages 1-3 of ``set_similarity_join``, exposed so the PPJoin
    positional filter's candidate-volume reduction is testable (and so
    a capacity planner can COUNT candidates without paying the exact
    verify).  Returns (toks, cand).

    Positional filter (Xiao et al., WWW'08 §3.2): a qualifying pair
    needs overlap >= α = τ·(|A|+|B|)/(1+τ).  At a shared prefix token
    sitting at 1-based positions (i, j) of the two ordered token
    lists, IF that token is the pair's FIRST common token then the
    whole intersection lies at or after it on both sides, so
    overlap <= 1 + min(|A|−i, |B|−j).  Pruning occurrences that fail
    that bound keeps every true pair (its first-common-token
    occurrence always passes — for any other shared occurrence the
    drop is harmless, the pair survives via `distinct` over the ones
    that pass).  The −1e-9 slack keeps a float-ulp wobble in τ·(…)
    from ever rounding the bound PAST an exactly-boundary pair:
    one-in-a-billion extra candidates is free, a dropped true pair
    breaks the exactness contract.

    ``prebuilt`` short-circuits the index build with an already-derived
    (toks, prefix) pair — the router passes the (persisted) index its
    estimate pass materialized, so one routed call builds the prefix
    index once (VERDICT r9 item 4).  ``per_doc`` (round 13) instead
    derives the prefix from an already-materialized global-order table
    so the caller can share one ``_ordered_tokens`` build with its
    verify lookups."""
    if prebuilt is not None:
        toks, prefix = prebuilt
    elif per_doc is not None:
        prefix = _explode_prefix(per_doc, tau)
    else:
        toks, prefix = _prefix_index(toks, tau, id_col, tok_col, assume_distinct)
    a, b = prefix.alias("a"), prefix.alias("b")
    cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("b.sz") >= F.lit(tau) * F.col("a.sz"))
        & (F.col("a.sz") >= F.lit(tau) * F.col("b.sz"))
    )
    if positional:
        alpha = F.lit(tau / (1.0 + tau)) * (F.col("a.sz") + F.col("b.sz"))
        ubound = 1 + F.least(
            F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
        )
        cond = cond & (ubound >= alpha - F.lit(1e-9))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sz").alias("a_sz"),
            F.col("b.sz").alias("b_sz"),
        )
        .distinct()
    )
    return toks, cand


def set_similarity_join(
    toks: DataFrame,
    tau: float,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    positional: bool = True,
    assume_distinct: bool = False,
    prebuilt: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """EXACT Jaccard set-similarity self-join via PREFIX FILTERING
    (AllPairs/PPJoin family — Bayardo et al., WWW'07; Xiao et al.,
    WWW'08): all pairs with J(A,B) >= tau, no false negatives, no
    hashing error.  j3's MinHash-LSH trades a recall tail for speed;
    this is the path for dedup contracts that must be exact.

    ``toks`` is an exploded (id, token) table; duplicates are removed.
    Returns (a_id, b_id, jaccard ROUND 6) with a_id < b_id.

    The prefix principle: order every document's tokens by one global
    total order (ascending document frequency, then token — rarest
    first).  If J(A,B) >= tau, A and B must share a token within their
    first |X| - ceil(tau·|X|) + 1 tokens (suppose not: the smallest
    intersection token in A's prefix would have to be both before and
    after the last token of B's prefix).  So joining PREFIX tokens
    only generates every qualifying pair — and prefixes are the
    RAREST tokens, so join fan-out per token is small by construction.

    Plan shape, per stage: (1) token df — one partial-agg groupBy;
    (2) per-doc sorted token array — one groupBy (arrays of struct
    (df, tok), sorted per row, NO global rank window — the (df, tok)
    tuple IS the total order, so nothing single-partition anywhere);
    (3) explode prefixes, self-join on prefix token with the length
    filter tau·|A| <= |B| <= |A|/tau AND PPJoin's positional filter
    (1 + min(|A|−i, |B|−j) >= τ·(|A|+|B|)/(1+τ) at prefix positions
    i, j — see ``_ssj_candidates`` for the safety argument; disable
    with ``positional=False`` to measure its candidate reduction);
    (4) exact verify: candidates join the PER-DOC SORTED TOKEN ARRAY
    table twice (by a_id, b_id) and the intersection size is a
    row-local F.size(F.array_intersect(...)) — the shuffle carries
    |cand| rows with two array payloads, NEVER the Σ|A|-per-candidate
    row explosion of a token-level re-join (round 8 measured that
    explosion filling 60 GB of shuffle spill at sf10/τ=0.5 — swapping
    to the array verify is a pure plan change, identical counts).
    Candidate volume is O(sum over prefix tokens of df²) with df
    small for rare tokens, shrunk further by the positional bound
    (measured on the sf0.01 planted corpus in
    tests/test_new_ops_props.py: strictly fewer candidates, identical
    final pairs).

    Round-13 verify shape (guide §2.3/§5): outside the router path the
    global-order table is built ONCE (eager localCheckpoint inside
    ``_ordered_tokens``) and feeds prefix explode + BOTH verify
    lookups — the profiled un-cut form recomputed the df-join +
    per-doc groupBy per branch; and the verify arrays ship xxhash64
    tokens (ARRAY<BIGINT>), cutting the candidate-join payload ~3×
    and the per-pair intersect to integer compares
    (``_hashed_token_arrays`` has the written collision bound)."""
    if prebuilt is not None:
        toks, cand = _ssj_candidates(
            toks, tau, id_col, tok_col, positional, assume_distinct, prebuilt
        )
        # prebuilt toks is already normalized to (doc_id, tok)
        arrs = toks.groupBy("doc_id").agg(
            F.collect_list(F.xxhash64("tok")).alias("ts")
        )
    else:
        toks, per_doc = _ordered_tokens(
            toks, id_col, tok_col, assume_distinct, materialize=True
        )
        toks, cand = _ssj_candidates(
            toks, tau, "doc_id", "tok", positional, True, per_doc=per_doc
        )
        arrs = _hashed_token_arrays(per_doc)
    inter = (
        cand.join(
            arrs.select(F.col("doc_id").alias("a_id"), F.col("ts").alias("a_ts")),
            "a_id",
        )
        .join(
            arrs.select(F.col("doc_id").alias("b_id"), F.col("ts").alias("b_ts")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            "a_sz",
            "b_sz",
            F.size(F.array_intersect("a_ts", "b_ts")).alias("inter"),
        )
    )
    jac = F.col("inter") / (F.col("a_sz") + F.col("b_sz") - F.col("inter"))
    return inter.filter(jac >= tau).select(
        "a_id", "b_id", F.round(jac, 6).alias("jaccard")
    )


# j50/j52 share one derived corpus (docs + dropped-first-word twins)
# and therefore one distinct (doc_id, tok) shingle table, which feeds
# FOUR plan branches per query (df count, per-doc sort, and both verify
# lookups).  Cached per (applicationId, sf_dir) like j3's shingles and
# j9b's signatures: whether Catalyst reuses the distinct's Exchange
# across branches is AQE-timing-dependent, which the round-7 bench saw
# as a 9.6-15.5 s j50 spread; persisting the distinct pins it to one
# materialization and repeat invocations measure steady state.
_J50_TOKS_CACHE: dict = register_cache({})

# j53's persisted corpus dedup index (shingles + band signatures),
# keyed (applicationId, sf_dir, "j53corpus") — the across-ingest reuse
# incremental_dedup's contract promises; bounded like every session
# cache (one (app, sf_dir) generation).
_J53_CORPUS_CACHE: dict = register_cache({})

# The routed join's one-per-call persisted prefix index (VERDICT r9
# item 4): keyed (applicationId, "routed_prefix") — a single live
# generation; each routed call's cache_put unpersists the previous
# call's index (same-key overwrite eviction in session_cache).
_ROUTED_PREFIX_CACHE: dict = register_cache({})


def _j50_corpus_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    t = _J50_TOKS_CACHE.get(key)
    if t is None:
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        perturbed = d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
        corpus = d.unionByName(perturbed).repartition(
            spark.sparkContext.defaultParallelism, "doc_id"
        )
        t = (
            corpus.select("doc_id", F.explode(word_shingles("text", 3)).alias("tok"))
            .distinct()
            .persist()
        )
        cache_put(_J50_TOKS_CACHE, key, t)
    return t


# j50's oracle is the exhaustive inverted-index pair join (every pair
# sharing ANY shingle, exact Jaccard >= tau) — legitimate as a DRIVER
# oracle here, unlike for j3, because prefix filtering is EXACT: the
# engine's result is defined to equal the exhaustive pair set, so gate
# equality attests the no-false-negative guarantee itself on every run.
_J50_TAU = 0.5
_J50_ORACLE = f"""{_J3_CORPUS_CTES},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id)
SELECT a_id, b_id,
       ROUND(len(list_intersect(x.s, y.s))::DOUBLE
             / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard
FROM cand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
WHERE len(list_intersect(x.s, y.s))::DOUBLE
      / len(list_distinct(list_concat(x.s, y.s))) >= {_J50_TAU}
"""


@register("j50_jaccard_prefix_join", oracle=_J50_ORACLE)
def j50_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j50 (extension): EXACT near-duplicate pairs via prefix-filtered
    set-similarity join on 3-word shingles, tau 0.5 — same planted
    corpus (one perturbed first-word-dropped copy per doc, doc_id +
    100000) and same pair DEFINITION as j3's exhaustive referee, but
    computed with the AllPairs/PPJoin prefix filter instead of either
    MinHash banding (probabilistic) or the inverted-index join over
    every shared token (Θ(Σ df²) — the j3c trap).  The oracle IS the
    exhaustive definition, so every gate run re-attests exactness.

    Delegates to ``set_similarity_join`` over the session-cached
    distinct shingle table (``_J50_TOKS_CACHE`` — the round-8
    variance pin)."""
    toks = _j50_corpus_toks(spark, sf_dir)
    return set_similarity_join(toks, _J50_TAU, assume_distinct=True)


# ---------------------------------------------------------------------------
# j50b/j50c: cardinality-routed set-similarity join — the low-τ answer
# ---------------------------------------------------------------------------


def ssj_candidate_estimate(
    toks: DataFrame,
    tau: float,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    assume_distinct: bool = False,
    prefix: DataFrame | None = None,
) -> int:
    """Upper bound on ``set_similarity_join``'s candidate volume:
    Σ over prefix tokens t of C(pref_df(t), 2) — the row count the
    prefix self-join would emit BEFORE the length/positional filters.
    One partial-agg pass over the prefix index (token-df groupBy +
    per-doc sort + prefix explode + one groupBy-sum), returned as a
    bounded driver scalar: this is the capacity-planning number that
    decides whether the exact join is affordable, computed without
    paying for it.  Deterministic and integer-valued, so an oracle can
    replay the routing decision exactly (the j38 discipline).

    ``prefix`` accepts an already-built prefix index so the router can
    estimate from the same (persisted) index its exact branch then
    joins — one ``_prefix_index`` per routed call."""
    if prefix is None:
        _, prefix = _prefix_index(toks, tau, id_col, tok_col, assume_distinct)
    row = (
        prefix.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("pdf"))
        .agg(F.expr("sum((pdf * (pdf - 1)) div 2)").alias("e"))
        .first()
    )
    return int(row["e"] or 0)


def jaccard_join_routed(
    toks: DataFrame,
    tau: float,
    cand_budget: int,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    assume_distinct: bool = False,
    force_route: str | None = None,
) -> DataFrame:
    """ONE entry point for Jaccard pair search that picks the EXACT
    prefix-filtered join (j50) or the MinHash-LSH banded join with
    exact verify (j3's machinery) by ESTIMATED candidate volume —
    VERDICT r8's top ask, closing the recorded low-τ boundary: round 8
    measured j50's τ=0.5 contract exhausting 60 GB of shuffle at sf10
    because a recall-heavy exact contract's Σ C(pref_df, 2) is
    intrinsic, and left "route low-τ to banding" as docstring
    guidance.  This makes the routing CODE, j38-style: the estimate is
    a deterministic integer (``ssj_candidate_estimate``), the branch
    is a pure comparison against ``cand_budget``, and registered
    queries replay estimate + branch + both release definitions in
    their oracle, so a Spark-side routing regression mismatches even
    when both branches are individually correct.

    Contract by branch (declared in the released ``route`` column):
    ``exact`` releases ALL pairs with J >= tau (no false negatives);
    ``lsh`` releases band-colliding pairs verified to J >= tau — the
    LSH recall trade (a pair missing every band is lost), the same
    contract j3 ships and the standard one at the scale where exact
    is unaffordable.  False positives are impossible on either branch
    (both verify exactly).

    100 TB shape: the estimate is one partial-agg pass; the exact
    branch is j50's bounded prefix join; the LSH branch is a band-key
    groupBy join (never docs²) whose banding derives from j3's
    constants.  The budget maps to executor memory: candidates ×
    ~24 bytes/row per shuffle partition.

    The estimate pass and the exact branch share ONE prefix-index
    materialization (VERDICT r9 item 4): when routing is live, the
    index is built once, persisted (bounded via the session-cache
    generation discipline), materialized by the estimate's aggregate,
    and handed to the exact branch's candidate join; the LSH branch
    unpersists it immediately (banding never touches the index)."""
    route = force_route
    est = None
    prebuilt = None
    if route is None:
        toks2, prefix = _prefix_index(toks, tau, id_col, tok_col, assume_distinct)
        prefix = prefix.persist()
        cache_put(
            _ROUTED_PREFIX_CACHE,
            (toks.sparkSession.sparkContext.applicationId, "routed_prefix"),
            prefix,
        )
        est = ssj_candidate_estimate(
            toks, tau, id_col, tok_col, assume_distinct, prefix=prefix
        )
        route = "exact" if est <= cand_budget else "lsh"
        prebuilt = (toks2, prefix)
    if route == "exact":
        out = set_similarity_join(
            toks, tau, id_col, tok_col,
            assume_distinct=assume_distinct, prebuilt=prebuilt,
        )
        return out.withColumn("route", F.lit("exact"))
    if prebuilt is not None:
        # The LSH branch never joins the prefix index — free it now
        # rather than waiting for the next routed call's eviction.
        prebuilt[1].unpersist()
    # LSH branch: j3's banding over shingle SETS rebuilt from the token
    # table (collect_set — minhash is set-semantics, order-free), band
    # self-join for candidates, exact Jaccard verify.
    sh = (
        toks.select(F.col(id_col).alias("doc_id"), F.col(tok_col).alias("tok"))
        .groupBy("doc_id")
        .agg(F.collect_set("tok").alias("shingles"))
    )
    banded = banded_signatures(sh)
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    verified = (
        cand.join(
            sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sh_a")),
            "a_id",
        )
        .join(
            sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sh_b")),
            "b_id",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        verified.filter(jac >= tau)
        .select(
            "a_id",
            "b_id",
            F.round(jac, 6).alias("jaccard"),
            F.lit("lsh").alias("route"),
        )
    )


# Oracle replay of the routing estimate: the same (df asc, tok asc)
# global order, ceil prefix length, and Σ C(pref_df, 2) integer sum the
# engine computes — pdf*(pdf-1) is always even, so the integer halving
# is exact on both engines.
_J50B_EST_CTES = f"""
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
dfreq AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY g),
ord AS (SELECT i.doc_id, i.g, d.df,
               ROW_NUMBER() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.g) AS pos,
               COUNT(*) OVER (PARTITION BY i.doc_id) AS sz
        FROM inv i JOIN dfreq d ON d.g = i.g),
pref AS (SELECT * FROM ord WHERE pos <= sz - CEIL({_J50_TAU} * sz) + 1),
est AS (SELECT COALESCE(SUM((pdf * (pdf - 1)) // 2), 0) AS e
        FROM (SELECT COUNT(*) AS pdf FROM pref GROUP BY g))"""


def _j50_routed_oracle(budget: int) -> str:
    """j38-style routed oracle: BOTH release definitions (the exact
    exhaustive referee and j3's structural band replay) are defined,
    and the replayed integer estimate guards which one emits rows."""
    exact_rel = f"""
exact_rel AS (
  SELECT a_id, b_id,
         ROUND(len(list_intersect(x.s, y.s))::DOUBLE
               / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard,
         'exact' AS route
  FROM (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id) c
  JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
  WHERE len(list_intersect(x.s, y.s))::DOUBLE
        / len(list_distinct(list_concat(x.s, y.s))) >= {_J50_TAU}
)"""
    # j3's band replay, re-based on this corpus's `sh`/`inv` CTEs.
    perms = _perm_constants(_MINHASH_PERMS)
    r = _MINHASH_PERMS // _MINHASH_BANDS
    min_cols = ",\n         ".join(
        f"MIN(({a} * hv + {b}) % {_MERSENNE}) AS m{p}" for p, (a, b) in enumerate(perms)
    )
    bandrows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {band} AS band, {cols} FROM mins".format(
            band=band,
            cols=", ".join(f"m{band * r + i} AS x{i}" for i in range(r)),
        )
        for band in range(_MINHASH_BANDS)
    )
    band_eq = " AND ".join(f"a.x{i} = b.x{i}" for i in range(r))
    lsh_rel = f"""
hv AS (SELECT doc_id,
              ('0x' || substr(md5(g), 1, 15))::BIGINT % {_MERSENNE} AS hv
       FROM inv),
mins AS (SELECT doc_id,
         {min_cols}
         FROM hv GROUP BY doc_id),
bandrows AS (
{bandrows}
),
lsh_rel AS (
  SELECT a_id, b_id,
         ROUND(len(list_intersect(x.s, y.s))::DOUBLE
               / len(list_distinct(list_concat(x.s, y.s))), 6) AS jaccard,
         'lsh' AS route
  FROM (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bandrows a JOIN bandrows b
          ON a.band = b.band AND {band_eq} AND a.doc_id < b.doc_id) c
  JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
  WHERE len(list_intersect(x.s, y.s))::DOUBLE
        / len(list_distinct(list_concat(x.s, y.s))) >= {_J50_TAU}
)"""
    return f"""{_J3_CORPUS_CTES},
{_J50B_EST_CTES},
{exact_rel},
{lsh_rel}
SELECT * FROM exact_rel WHERE (SELECT e FROM est) <= {budget}
UNION ALL
SELECT * FROM lsh_rel WHERE (SELECT e FROM est) > {budget}
"""


# j50b's budget is calibrated to the EXACT branch's real unit cost: the
# verify join ships each candidate with BOTH per-doc token arrays
# (~KB/row on this corpus), so candidates — not bytes — are the budget
# currency, and round 8's measured boundary ("shuffle spill > 60 GB" at
# sf10/τ=0.5) sits at an estimate of 1.78e8 while sf1 (completed in
# 136 s, round 7) sits at 1.8e7 (both measured round 9, BASELINE.md).
# 5e7 splits the decade: the gate SFs (estimate ~2e4) and sf1 route
# exact; sf10 flips to the LSH contract exactly where exact was
# measured dying.  j50c pins the budget BELOW the sf0.01 estimate so
# the gate also attests the LSH branch and the guard's other side —
# same engine, same oracle template, different constant.
_J50B_BUDGET = 50_000_000
_J50C_BUDGET = 1_000


@register("j50b_jaccard_routed", oracle=_j50_routed_oracle(_J50B_BUDGET))
def j50b_jaccard_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j50b (extension): ``jaccard_join_routed`` at τ=0.5 over the
    j50 planted corpus with the production candidate budget (``_J50B_BUDGET`` = 5e7) —
    the gate SFs route EXACT (estimate replayed in the oracle guard),
    and the same registered query flips to the LSH contract at the
    scale where round 8 recorded the exact contract exhausting disk.
    See ``jaccard_join_routed``."""
    toks = _j50_corpus_toks(spark, sf_dir)
    return jaccard_join_routed(
        toks, _J50_TAU, _J50B_BUDGET, assume_distinct=True
    )


@register("j50c_jaccard_routed_lsh", oracle=_j50_routed_oracle(_J50C_BUDGET))
def j50c_jaccard_routed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j50c (extension): j50b's twin with the budget pinned BELOW the
    gate-SF estimate, so the driver gate attests the ROUTER's other
    branch — the LSH-banded candidate join with exact verify — and the
    guard comparison from the far side.  The oracle replays the same
    estimate and flips to the band-replay release (the j3 structural
    oracle) under the same comparison.  See ``jaccard_join_routed``."""
    toks = _j50_corpus_toks(spark, sf_dir)
    return jaccard_join_routed(
        toks, _J50_TAU, _J50C_BUDGET, assume_distinct=True
    )


# ---------------------------------------------------------------------------
# j51: deterministic weighted sampling (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis & Spirakis
    (IPL 2006) A-ES: each row draws key u^(1/w) with u ~ U(0,1) and
    the k largest keys are the sample — inclusion probability exactly
    proportional to weight at each sequential draw.  u is the
    md5-derived ``hash_uniform`` (dp.py), so the draw is DETERMINISTIC
    and engine-replayable; ranking maximizes the monotone-equivalent
    ln(u)/w (no pow), guarded away from ln(0).

    Plan shape: one map-side key expression + global top-k —
    TakeOrderedAndProject (per-partition heap of k, driver merge), the
    f3 shape: no shuffle, no window, no single-partition sort, at any
    scale.  draw_rank is computed AFTER the k-row cut (window over k
    rows, not n).

    Weights must be STRICTLY POSITIVE — A-ES is undefined otherwise
    (w = 0 ⇒ ln(u)/w = −inf/NaN; w < 0 FLIPS the key sign, so
    negative-weight rows would win every draw: a silent wrong sample).
    Rows violating the precondition fail the whole job (round-7
    review: an error, never a quietly poisoned sample); filter them
    out upstream if zero-weight rows are expected.

    Returns the k sampled rows + draw_rank 1..k."""
    from pyspark.sql import Window

    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    u = F.greatest(hash_uniform(F.col(id_col), salt), F.lit(1e-18))
    w_ok = F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    key = F.when(w_ok, F.log(u) / F.col(weight_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"weighted_sample_topk: non-positive weight in "
                    f"{weight_col!r} at {id_col}="
                ),
                F.col(id_col).cast("string"),
            )
        )
    )
    topk = (
        df.withColumn("_es_key", key)
        .orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_es_key").desc(), F.col(id_col).asc())
    return (
        topk.withColumn("draw_rank", F.row_number().over(w))
        .drop("_es_key")
    )


def _j51_oracle() -> str:
    from ma_anonymization_etl_spark.operators.dp import _sql_uniform

    u = f"GREATEST({_sql_uniform('doc_id', 'j51|')}, 1e-18)"
    return f"""
WITH s AS (SELECT doc_id, lang, n_chars, ln({u}) / n_chars AS es_key
           FROM documents)
SELECT doc_id, lang, n_chars,
       ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id ASC) AS draw_rank
FROM s ORDER BY es_key DESC, doc_id ASC LIMIT 100
"""


@register("j51_weighted_sample", oracle=_j51_oracle())
def j51_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j51 (extension): deterministic WEIGHTED document sampling —
    100 docs drawn with probability proportional to length (n_chars),
    the standard size-proportional corpus subsample (longer docs carry
    more training tokens, so token-budget sampling weights by length).
    Efraimidis-Spirakis keys from the md5 hash_uniform; the oracle
    replays u, key, and the top-k cut exactly.  Float caveat: ln() on
    the two engines can differ in the last ulp, which reorders a pair
    only if two keys collide to ~1e-15 relative — negligible for
    md5-spread keys.

    Delegates to ``weighted_sample_topk``."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_topk(d, "n_chars", 100, "j51|", id_col="doc_id")


# ---------------------------------------------------------------------------
# j52: directed containment join (near-superset detection)
# ---------------------------------------------------------------------------


def _containment_candidates(
    toks: DataFrame,
    c: float,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    assume_distinct: bool = False,
    positional: bool = True,
    df_cap: int | None = None,
    per_doc: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Candidate stage of ``containment_join``, exposed (like
    ``_ssj_candidates``) so the positional/length filters' and the
    df-cap's candidate-volume reductions are testable and a capacity
    planner can COUNT candidates without the verify.  Returns
    (toks, cand) with cand = (a_id, b_id, a_sz).

    The candidate join is prefix(A) ⋈ the FULL position-annotated
    token table on token.  Two EXACT filters ride the join condition
    (both evaluate inside the token-equality join, so pruned pairs
    never reach the candidate-distinct shuffle — the stage that
    exhausted disk in the round-8 sf10 sweep):

    * length: |B| >= c·|A| (containment needs |A∩B| <= |B|);
    * positional (the containment form of PPJoin's bound): if the
      joined token t, at 1-based positions (i, j) of A's and B's
      shared global order, is the pair's FIRST common token, then the
      whole intersection sits at-or-after it on both sides, so
      |A∩B| <= 1 + min(|A|−i, |B|−j); requiring that bound >= c·|A|
      keeps every true pair because the first common token is the
      MINIMAL intersection token in the global order and the prefix is
      a down-set of that order — the first-common-token occurrence is
      always generated and always passes.  Hot tokens sort LATE in the
      order (high df ⇒ high j ⇒ small |B|−j), so this is precisely the
      filter that starves high-df tokens of candidate fan-out.
      The −1e-9 slack keeps a float-ulp wobble in c·|A| from rounding
      the bound past an exactly-boundary pair (the j50 discipline).

    ``df_cap`` is the EXPLICIT RECALL CONTRACT (VERDICT r8 item 1, the
    round-8 docstring knob as code): tokens with df > cap are dropped
    from BOTH sides of candidate GENERATION (never from verification).
    The capped result is exactly the pairs with containment >= c whose
    FIRST common token is sub-cap (first-common-token t0 of any pair
    discoverable via some sub-cap prefix token t sorts at-or-before t
    in the df-ascending order, so df(t0) <= df(t) <= cap — the cap
    only loses pairs whose entire overlap evidence is hot tokens).
    That is a CONTRACT CHANGE, not an optimization: registered capped
    queries replay the cap structurally in their oracle (the j3
    band-replay pattern) rather than claiming the exhaustive pair
    set.

    ``per_doc`` (round 13): an already-materialized global-order table
    to share with the caller's verify lookups (the
    ``set_similarity_join`` discipline).  The full position-annotated
    table is exploded ONCE and the prefix is a pos-filter of it —
    identical rows to the former slice-then-explode (the slice IS the
    pos ≤ pref_len down-set), one fewer Generate subtree."""
    if per_doc is None:
        toks, per_doc = _ordered_tokens(toks, id_col, tok_col, assume_distinct)
    # Positions are assigned in the UNCAPPED global order (the cap must
    # not shift positions, or the positional bound loses its meaning).
    full = per_doc.select(
        "doc_id",
        "sz",
        F.posexplode("ord_toks").alias("p0", "p"),
    ).select(
        "doc_id",
        "sz",
        (F.col("p0") + 1).alias("pos"),
        F.col("p.tok").alias("tok"),
        F.col("p.df").alias("df"),
    )
    pref_len = F.col("sz") - F.ceil(F.lit(c) * F.col("sz")) + 1
    prefix = full.filter(F.col("pos") <= pref_len)
    if df_cap is not None:
        prefix = prefix.filter(F.col("df") <= int(df_cap))
        full = full.filter(F.col("df") <= int(df_cap))
    need = F.lit(c) * F.col("a.sz") - F.lit(1e-9)
    cond = (F.col("a.tok") == F.col("b.tok")) & (
        F.col("a.doc_id") != F.col("b.doc_id")
    )
    if positional:
        cond = (
            cond
            & (F.col("b.sz") >= need)
            & (
                1
                + F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                >= need
            )
        )
    cand = (
        prefix.alias("a")
        .join(full.alias("b"), cond)
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.sz").alias("a_sz"),
        )
        .distinct()
    )
    return toks, cand


def containment_join(
    toks: DataFrame,
    c: float,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    assume_distinct: bool = False,
    positional: bool = True,
    df_cap: int | None = None,
) -> DataFrame:
    """EXACT directed CONTAINMENT self-join: ordered pairs (A, B),
    A ≠ B, with |A∩B| / |A| >= c — "A is (nearly) contained in B".
    Jaccard (j50) misses asymmetric duplication by construction: a
    paragraph quoted inside a 100× longer page has Jaccard ≈ 0.01 but
    containment 1.0; quote/boilerplate/subset detection needs this
    operator, not a symmetric one.

    Single-sided prefix principle (the asymmetric cousin of j50's):
    |A∩B| >= ⌈c·|A|⌉ and A has only ⌈c·|A|⌉ − 1 tokens after its
    first |A| − ⌈c·|A|⌉ + 1 in the global (df, tok) order — so some
    intersection token lies in A's PREFIX.  B contributes its full
    token list (no prefix exists for the containee-unbounded side).
    Candidates therefore come from prefix(A) ⋈ full(B) on token —
    still df-bounded because A's prefix holds A's RAREST tokens.
    Plan: the j50 machinery with one asymmetric join — token df
    groupBy, per-doc (df, tok)-sorted arrays, prefix explode for the
    LEFT side only, candidate join against the position-annotated full
    token table with the EXACT length (|B| >= c·|A|) and positional
    (1 + min(|A|−i, |B|−j) >= c·|A|) filters inside the join condition
    — see ``_containment_candidates`` for the safety argument; both
    prune BEFORE the candidate-distinct shuffle, which is the stage
    round 8 measured exhausting sf10 disk.  Verification is the
    row-local array_intersect over the candidate-row-bounded shuffle
    (never the Σ|A|-per-candidate token re-join).

    ``df_cap`` (VERDICT r8 item 1, the round-8 docstring knob as
    code) drops tokens with df > cap from candidate GENERATION on
    both sides — an EXPLICIT RECALL CONTRACT (pairs whose first
    common token is sub-cap), not an optimization; see
    ``_containment_candidates``.  Verification always uses the
    uncapped lists (hashed to ARRAY<BIGINT> — the round-13
    ``_hashed_token_arrays`` trade, bound written there) and reads the
    same eagerly-materialized global-order table as candidate
    generation (one ``_ordered_tokens`` build per call)."""
    toks, per_doc = _ordered_tokens(
        toks, id_col, tok_col, assume_distinct, materialize=True
    )
    toks, cand = _containment_candidates(
        toks, c, "doc_id", "tok", True, positional, df_cap, per_doc=per_doc
    )
    arrs = _hashed_token_arrays(per_doc)
    inter = (
        cand.join(
            arrs.select(F.col("doc_id").alias("a_id"), F.col("ts").alias("a_ts")),
            "a_id",
        )
        .join(
            arrs.select(F.col("doc_id").alias("b_id"), F.col("ts").alias("b_ts")),
            "b_id",
        )
        .select(
            "a_id",
            "b_id",
            "a_sz",
            F.size(F.array_intersect("a_ts", "b_ts")).alias("inter"),
        )
    )
    cont = F.col("inter") / F.col("a_sz")
    return inter.filter(cont >= c).select(
        "a_id", "b_id", F.round(cont, 6).alias("containment")
    )


_J52_C = 0.9
# Exhaustive directed referee as the driver oracle — same justification
# as j50: the prefix filter is EXACT, so gate equality with the
# unfiltered definition re-attests the no-false-negative claim per run.
_J52_ORACLE = f"""{_J3_CORPUS_CTES},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id != b.doc_id)
SELECT a_id, b_id,
       ROUND(len(list_intersect(x.s, y.s))::DOUBLE / len(x.s), 6) AS containment
FROM cand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
WHERE len(list_intersect(x.s, y.s))::DOUBLE / len(x.s) >= {_J52_C}
"""


@register("j52_containment_join", oracle=_J52_ORACLE)
def j52_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j52 (extension): directed near-superset pairs at containment
    >= 0.9 over the planted corpus — every perturbed copy (first word
    dropped) is FULLY contained in its original (containment exactly
    1.0: dropping word 1 removes only the leading shingle), and the
    original is ~(s−1)/s-contained in the copy, so both directions of
    each planted pair must appear plus any organic near-supersets.
    Jaccard would see these same pairs only because the corpus twins
    are near-identical in length; j52 exists for the asymmetric cases
    j50 cannot represent.

    Delegates to ``containment_join`` over the same session-cached
    distinct shingle table as j50."""
    toks = _j50_corpus_toks(spark, sf_dir)
    return containment_join(toks, _J52_C, assume_distinct=True)


# j52b's cap: shingles in more than _J52B_DF_CAP docs are dropped from
# candidate generation.  64 ≈ 30× the planted twin multiplicity (a
# planted pair's discriminative shingles have df 2-4 at every SF), so
# on THIS corpus the capped release equals the exhaustive one — but
# that equality is a corpus fact, not the contract, so the oracle
# replays the CAP (prefix + df filter + positional bound) structurally
# rather than borrowing j52's exhaustive referee.
_J52B_DF_CAP = 64

# Structural replay of the capped candidate generation (the j3
# band-replay pattern): same (df asc, tok asc) global order (ROW_NUMBER
# vs the engine's per-row array_sort — identical because (df, tok) is
# unique within a doc), same ceil prefix length, same df cap on BOTH
# sides, same length + positional bounds with the same −1e-9 slack,
# exact containment verify on the uncapped shingle lists.  A Spark-side
# regression in any of those stages mismatches even when the released
# pairs happen to equal the exhaustive set.
_J52B_ORACLE = f"""{_J3_CORPUS_CTES},
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
dfreq AS (SELECT g, COUNT(*) AS df FROM inv GROUP BY g),
ord AS (SELECT i.doc_id, i.g, d.df,
               ROW_NUMBER() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.g) AS pos,
               COUNT(*) OVER (PARTITION BY i.doc_id) AS sz
        FROM inv i JOIN dfreq d ON d.g = i.g),
pref AS (SELECT * FROM ord
         WHERE pos <= sz - CEIL({_J52_C} * sz) + 1 AND df <= {_J52B_DF_CAP}),
fullt AS (SELECT * FROM ord WHERE df <= {_J52B_DF_CAP}),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM pref a JOIN fullt b
           ON a.g = b.g AND a.doc_id != b.doc_id
          AND b.sz >= {_J52_C} * a.sz - 1e-9
          AND 1 + LEAST(a.sz - a.pos, b.sz - b.pos) >= {_J52_C} * a.sz - 1e-9)
SELECT a_id, b_id,
       ROUND(len(list_intersect(x.s, y.s))::DOUBLE / len(x.s), 6) AS containment
FROM cand JOIN sh x ON x.doc_id = a_id JOIN sh y ON y.doc_id = b_id
WHERE len(list_intersect(x.s, y.s))::DOUBLE / len(x.s) >= {_J52_C}
"""


@register("j52b_containment_capped", oracle=_J52B_ORACLE)
def j52b_containment_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j52b (extension): j52's release under the EXPLICIT df-cap
    contract — the round-8 "docstring knob" as registered CODE
    (VERDICT r8 item 1).  Candidate generation drops every shingle
    with df > 64 from both join sides, which removes exactly the
    Σ pref_df(t)·df(t) hot terms that exhausted sf10 disk in round 8;
    the contract narrows to "pairs whose first common token is
    sub-cap" (see ``_containment_candidates`` — the cap only loses
    pairs whose entire overlap evidence is hot tokens, the LSH-banding
    style of trade).  The oracle replays the capped generation
    structurally, so the recall trade-off itself is hash-checked; a
    property test separately pins capped == uncapped on this corpus
    (df 2-4 planted shingles, cap 64 — equality is a corpus fact, not
    the contract).

    Delegates to ``containment_join(df_cap=_J52B_DF_CAP)``."""
    toks = _j50_corpus_toks(spark, sf_dir)
    return containment_join(
        toks, _J52_C, assume_distinct=True, df_cap=_J52B_DF_CAP
    )


# ---------------------------------------------------------------------------
# j54: BM25 retrieval scoring — the standard search/decontamination scorer
# ---------------------------------------------------------------------------

_J54_K1 = 1.2
_J54_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    k1: float = _J54_K1,
    b: float = _J54_B,
    k: int = 100,
) -> DataFrame:
    """j54's engine: Okapi BM25 (Robertson et al., TREC-3) top-``k``
    retrieval over ``docs`` (doc_id, text) for ``query_terms`` — the
    saturating-tf, length-normalized scorer a decontamination or
    search user reaches for after j6's raw tf·idf (VERDICT r8 item 6).
    When ``query_terms`` is None the query is the corpus's 5 most
    frequent words (count desc, word asc — a deterministic, replayable
    derivation; 5 scalar rows collected at plan-build time, the
    j38/i43 bounded-driver-scalar discipline).

    Cross-engine exactness (the j30 micro-nat treatment, extended):
    the only implementation-defined float op is ln, so per-term IDF =
    ln((N − df + ½)/(df + ½) + 1) is quantized ONCE to integer
    micro-nats; the tf saturation factor tf·(k1+1)/(tf + k1·(1 − b +
    b·dl/avgdl)) is pure IEEE +,−,×,÷ over integers and one shared
    avgdl double — bit-identical on any IEEE engine given the same
    expression tree, which the oracle mirrors token for token — and
    each per-term contribution is floored to an integer BEFORE the
    per-doc sum, so the sum is order-free.  Released score unit:
    micro-BM25 (int64).

    Plan shape: term stats are two vocab-bounded partial aggs; the
    query filter is a pushed-down isin over ≤ |q| literals; scoring
    joins the per-doc tf of query terms (|q|·N_docs rows worst case)
    against a BROADCAST 5-row idf table and the per-doc length table;
    top-k is TakeOrderedAndProject (per-partition heap, no global
    sort), rank windows over the k released rows only.  Nothing
    shuffles more than (docs × |q|) rows."""
    from pyspark.sql import Window

    sc = bm25_scores(docs, query_terms, k1, b)
    topk = sc.orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("bm25_micro").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    k1: float = _J54_K1,
    b: float = _J54_B,
) -> DataFrame:
    """Per-doc integer micro-BM25 scores for ``query_terms`` (docs with
    no query term are absent — their score is zero by definition).
    The scoring core shared by ``bm25_topk`` (retrieval) and the
    ``bm25_filter`` route step (decontamination); see ``bm25_topk``
    for the cross-engine exactness argument."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    if query_terms is None:
        cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        query_terms = [
            r["tok"]
            for r in cnt.orderBy(F.col("cnt").desc(), F.col("tok").asc())
            .limit(5)
            .collect()
        ]
    qtoks = toks.filter(F.col("tok").isin(list(query_terms)))
    dfq = qtoks.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = dfq.crossJoin(F.broadcast(st)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            * 1000000
        )
        .cast("long")
        .alias("idf6"),
        "avgdl",
    )
    tf = qtoks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .select("doc_id", F.floor(F.col("idf6") * sat).cast("long").alias("c6"))
    )
    return contrib.groupBy("doc_id").agg(F.sum("c6").alias("bm25_micro"))


def top_terms(docs: DataFrame, n_terms: int, text_col: str = "text") -> list[str]:
    """The ``n_terms`` most frequent whitespace tokens of ``docs``
    (count desc, token asc — deterministic), collected as a bounded
    driver scalar (the j38/i43 discipline).  The query-derivation step
    of BM25 retrieval and BM25 decontamination."""
    cnt = (
        docs.select(F.explode(F.split(text_col, " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return [
        r["tok"]
        for r in cnt.orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(int(n_terms))
        .collect()
    ]


_J54_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
st AS (SELECT COUNT(*) AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl),
cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
q AS (SELECT tok FROM cnt ORDER BY cnt DESC, tok ASC LIMIT 5),
dfq AS (SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks
              WHERE tok IN (SELECT tok FROM q))
        GROUP BY tok),
idf AS (SELECT tok,
               CAST(ROUND(ln(((SELECT n FROM st) - df + 0.5) / (df + 0.5) + 1.0)
                          * 1000000) AS BIGINT) AS idf6
        FROM dfq),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
contrib AS (
  SELECT t.doc_id,
         CAST(FLOOR(idf6 * ((t.tf * {_J54_K1 + 1.0!r}) /
              (t.tf + {_J54_K1!r} * (1.0 - {_J54_B!r} + {_J54_B!r} * d.dl
                                 / (SELECT avgdl FROM st))))) AS BIGINT) AS c6
  FROM tf t JOIN idf USING (tok) JOIN dl d ON d.doc_id = t.doc_id),
sc AS (SELECT doc_id, CAST(SUM(c6) AS BIGINT) AS bm25_micro
       FROM contrib GROUP BY doc_id),
top AS (SELECT doc_id, bm25_micro FROM sc
        ORDER BY bm25_micro DESC, doc_id ASC LIMIT 100)
SELECT doc_id, bm25_micro,
       ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id ASC) AS rank
FROM top
"""


@register("j54_bm25_topk", oracle=_J54_ORACLE)
def j54_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j54 (extension): BM25 top-100 documents for the corpus's 5 most
    frequent words — saturating tf (k1=1.2) and length normalization
    (b=0.75) over the j4/j6 token machinery, released in exact integer
    micro-BM25 so the driver hash matches bit-for-bit across engines.
    See ``bm25_topk``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    return bm25_topk(d)


def bm25_multi_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k1: float = _J54_K1,
    b: float = _J54_B,
    k: int = 20,
) -> DataFrame:
    """Multi-query BM25 retrieval in ONE corpus pass (NEXT r9 item d):
    ``queries`` is a small [(query_id, [terms...])] list (driver-held —
    eval suites are dozens of queries, the j38 bounded-scalar shape).
    Term statistics (df, idf, tf) are computed once over the UNION of
    all query terms; each tf row then fans out only to the queries
    containing its term (a broadcast join against the ≤ Σ|q| term
    table), and per-(query, doc) scores aggregate the floored integer
    contributions — so Q queries cost one corpus scan plus a
    (docs × matched-terms) shuffle, not Q passes.  Top-``k`` per query
    via a window PARTITIONED by query_id (the f4 shape, never global).
    Cross-engine exactness: identical to ``bm25_topk`` (integer
    micro-nats idf, IEEE-mirrored saturation, floor-before-sum)."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    qrows = [
        (int(qid), tok) for qid, terms in queries for tok in terms
    ]
    qdf = spark.createDataFrame(qrows, "query_id long, tok string")
    all_terms = sorted({tok for _, tok in qrows})
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtoks = toks.filter(F.col("tok").isin(all_terms))
    dfq = qtoks.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = dfq.crossJoin(F.broadcast(st)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            * 1000000
        )
        .cast("long")
        .alias("idf6"),
        "avgdl",
    )
    tf = qtoks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(qdf), "tok")
        .select(
            "query_id",
            "doc_id",
            F.floor(F.col("idf6") * sat).cast("long").alias("c6"),
        )
    )
    sc = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c6").alias("bm25_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25_micro").desc(), F.col("doc_id").asc()
    )
    return (
        sc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "bm25_micro", "rank")
    )


# j54b's queries: the corpus's top-15 words split into 3 query sets of
# 5 (ranks 1-5, 6-10, 11-15 by count desc / token asc) — deterministic
# and replayed by the oracle's ROW_NUMBER derivation, so the query
# DERIVATION is gate-attested alongside the scoring.
_J54B_ORACLE = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
st AS (SELECT COUNT(*) AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl FROM dl),
cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
q AS (SELECT tok,
             CAST((ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) - 1) // 5
                  AS BIGINT) AS query_id
      FROM cnt ORDER BY cnt DESC, tok ASC LIMIT 15),
dfq AS (SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks
              WHERE tok IN (SELECT tok FROM q))
        GROUP BY tok),
idf AS (SELECT tok,
               CAST(ROUND(ln(((SELECT n FROM st) - df + 0.5) / (df + 0.5) + 1.0)
                          * 1000000) AS BIGINT) AS idf6
        FROM dfq),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
       WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
contrib AS (
  SELECT q.query_id, t.doc_id,
         CAST(FLOOR(idf6 * ((t.tf * {_J54_K1 + 1.0!r}) /
              (t.tf + {_J54_K1!r} * (1.0 - {_J54_B!r} + {_J54_B!r} * d.dl
                                     / (SELECT avgdl FROM st))))) AS BIGINT) AS c6
  FROM tf t JOIN idf USING (tok) JOIN q USING (tok)
  JOIN dl d ON d.doc_id = t.doc_id),
sc AS (SELECT query_id, doc_id, CAST(SUM(c6) AS BIGINT) AS bm25_micro
       FROM contrib GROUP BY query_id, doc_id),
top AS (SELECT query_id, doc_id, bm25_micro,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id ASC) AS rank
        FROM sc)
SELECT query_id, doc_id, bm25_micro, rank FROM top WHERE rank <= 20
"""


@register("j54b_bm25_multi", oracle=_J54B_ORACLE)
def j54b_bm25_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j54b (extension): BM25 top-20 per query for THREE query sets
    (the corpus's top-15 words in rank bands of 5) scored in one
    corpus pass — the eval-suite retrieval shape.  The query
    derivation, term statistics, and floored integer scores all replay
    in the oracle.  See ``bm25_multi_topk``."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    terms = top_terms(d, 15)
    queries = [(i, terms[i * 5:(i + 1) * 5]) for i in range(3)]
    return bm25_multi_topk(d, queries, k=20)


_J54C_TITLE_LEN = 8
_J54C_W_TITLE = 2.0
_J54C_W_BODY = 1.0


def bm25f_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    k1: float = _J54_K1,
    b_title: float = _J54_B,
    b_body: float = _J54_B,
    w_title: float = _J54C_W_TITLE,
    w_body: float = _J54C_W_BODY,
    title_len: int = _J54C_TITLE_LEN,
    k: int = 100,
) -> DataFrame:
    """j54c's engine: BM25F (Robertson/Zaragoza/Taylor, CIKM 2004) —
    FIELD-WEIGHTED retrieval.  Real corpora carry structured fields
    (title/body/anchor) where a term hit is worth more in some fields
    than others; BM25F normalizes term frequency PER FIELD first, sums
    the weighted per-field tfs into one pseudo-frequency, and saturates
    ONCE — which is what distinguishes it from naively summing per-field
    BM25 scores (that would let a stuffed field saturate independently).
    This corpus has a single text column, so the field structure is
    DERIVED and contract-pinned: field "title" = the first
    ``title_len`` words, field "body" = the rest (the derivation the
    oracle replays; swap in real columns when a corpus has them).

        wtf(t,d)  = w_title·tf_title/B_title + w_body·tf_body/B_body
        B_f       = 1 − b_f + b_f·dl_f/avgdl_f        (per-field soft norm)
        score(d)  = Σ_t idf(t) · wtf·(k1+1)/(k1 + wtf)

    Cross-engine exactness: j54's integer micro-nat discipline — idf
    quantized once to int64 micro-nats; wtf/saturation are fixed IEEE
    expression trees mirrored token-for-token in the oracle (per-field
    lengths are ints, avgdl_f exact int-sum ÷ count); each per-term
    contribution floors to int64 BEFORE the order-free per-doc sum.  A
    corpus where every doc is all-title (avgdl_body = 0) drops the body
    component via an explicit guard rather than dividing by zero.

    Plan shape: identical to j54 plus one positional explode — the
    field tag rides the token (pos < title_len), tf_title/tf_body are
    one conditional aggregate, the idf/avgdl table (≤ |q| rows)
    broadcasts, top-k is TakeOrderedAndProject."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl")).select(
        "doc_id",
        F.least(F.col("dl"), F.lit(title_len)).alias("dlt"),
        F.greatest(F.col("dl") - title_len, F.lit(0)).alias("dlb"),
    )
    st = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dlt").cast("double") / F.count(F.lit(1))).alias("avgdlt"),
        (F.sum("dlb").cast("double") / F.count(F.lit(1))).alias("avgdlb"),
    )
    if query_terms is None:
        query_terms = top_terms(docs, 5)
    qtoks = toks.filter(F.col("tok").isin(list(query_terms)))
    dfq = qtoks.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = dfq.crossJoin(F.broadcast(st)).select(
        "tok",
        F.round(
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            * 1000000
        )
        .cast("long")
        .alias("idf6"),
        "avgdlt",
        "avgdlb",
    )
    tf = qtoks.groupBy("doc_id", "tok").agg(
        F.sum(F.when(F.col("pos0") < title_len, 1).otherwise(0)).alias("tft"),
        F.sum(F.when(F.col("pos0") >= title_len, 1).otherwise(0)).alias("tfb"),
    )
    bt = F.lit(1.0) - F.lit(b_title) + F.lit(b_title) * F.col("dlt") / F.col("avgdlt")
    bb = F.lit(1.0) - F.lit(b_body) + F.lit(b_body) * F.col("dlb") / F.col("avgdlb")
    wtf = F.lit(w_title) * F.col("tft") / bt + F.when(
        F.col("avgdlb") > 0.0, F.lit(w_body) * F.col("tfb") / bb
    ).otherwise(F.lit(0.0))
    sat = (wtf * F.lit(k1 + 1.0)) / (F.lit(k1) + wtf)
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .select("doc_id", F.floor(F.col("idf6") * sat).cast("long").alias("c6"))
    )
    sc = contrib.groupBy("doc_id").agg(F.sum("c6").alias("bm25f_micro"))
    topk = sc.orderBy(F.col("bm25f_micro").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("bm25f_micro").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w))


_J54C_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (SELECT doc_id, u.pos, ws[u.pos] AS tok
         FROM w, LATERAL unnest(range(1, len(ws) + 1)) u(pos)),
dl AS (SELECT doc_id, LEAST(len(ws), {_J54C_TITLE_LEN}) AS dlt,
              GREATEST(len(ws) - {_J54C_TITLE_LEN}, 0) AS dlb FROM w),
st AS (SELECT COUNT(*) AS n,
              SUM(dlt)::DOUBLE / COUNT(*) AS avgdlt,
              SUM(dlb)::DOUBLE / COUNT(*) AS avgdlb FROM dl),
cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
q AS (SELECT tok FROM cnt ORDER BY cnt DESC, tok ASC LIMIT 5),
dfq AS (SELECT tok, COUNT(*) AS df
        FROM (SELECT DISTINCT doc_id, tok FROM toks
              WHERE tok IN (SELECT tok FROM q))
        GROUP BY tok),
idf AS (SELECT tok,
               CAST(ROUND(ln(((SELECT n FROM st) - df + 0.5) / (df + 0.5) + 1.0)
                          * 1000000) AS BIGINT) AS idf6
        FROM dfq),
tf AS (SELECT doc_id, tok,
              SUM(CASE WHEN pos <= {_J54C_TITLE_LEN} THEN 1 ELSE 0 END) AS tft,
              SUM(CASE WHEN pos > {_J54C_TITLE_LEN} THEN 1 ELSE 0 END) AS tfb
       FROM toks WHERE tok IN (SELECT tok FROM q) GROUP BY doc_id, tok),
wt AS (SELECT t.doc_id, t.tok,
              ({_J54C_W_TITLE!r} * t.tft
                 / (1.0 - {_J54_B!r} + {_J54_B!r} * d.dlt / (SELECT avgdlt FROM st))
               + CASE WHEN (SELECT avgdlb FROM st) > 0.0
                      THEN {_J54C_W_BODY!r} * t.tfb
                           / (1.0 - {_J54_B!r} + {_J54_B!r} * d.dlb
                              / (SELECT avgdlb FROM st))
                      ELSE 0.0 END) AS wtf
       FROM tf t JOIN dl d ON d.doc_id = t.doc_id),
contrib AS (
  SELECT doc_id,
         CAST(FLOOR(idf6 * ((wtf * {_J54_K1 + 1.0!r}) / ({_J54_K1!r} + wtf)))
              AS BIGINT) AS c6
  FROM wt JOIN idf USING (tok)),
sc AS (SELECT doc_id, CAST(SUM(c6) AS BIGINT) AS bm25f_micro
       FROM contrib GROUP BY doc_id),
top AS (SELECT doc_id, bm25f_micro FROM sc
        ORDER BY bm25f_micro DESC, doc_id ASC LIMIT 100)
SELECT doc_id, bm25f_micro,
       ROW_NUMBER() OVER (ORDER BY bm25f_micro DESC, doc_id ASC) AS rank
FROM top
"""


@register("j54c_bm25f_topk", oracle=_J54C_ORACLE)
def j54c_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j54c (extension): BM25F top-100 for the corpus's 5 most frequent
    words — per-field length normalization (title = first 8 words at
    weight 2, body at weight 1), weighted pseudo-frequency, single
    saturation (the property that distinguishes BM25F from summing
    per-field BM25s).  Field derivation, term stats, and floored
    integer scores all replay in the oracle.  See ``bm25f_topk``
    (NEXT r10 item d)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    return bm25f_topk(d)


# ---------------------------------------------------------------------------
# j53: incremental (batch-vs-corpus) near-dedup — the ingestion path
# ---------------------------------------------------------------------------


def incremental_dedup(
    corpus_sh: DataFrame,
    batch_sh: DataFrame,
    tau: float = _MINHASH_TAU,
    corpus_banded: DataFrame | None = None,
) -> DataFrame:
    """j53's engine: dedup an ingest BATCH against an existing CORPUS
    without ever re-pairing the corpus with itself — the production
    dedup scenario (a crawl snapshot lands; the N-doc corpus is
    already deduped; only batch × corpus candidates matter).  Both
    sides get the shared MinHash-LSH banding (``banded_signatures``);
    candidates are band-sharing (batch, corpus) pairs ONLY — the
    corpus band index is O(corpus × bands) rows and reusable across
    batches, and the join output is O(batch-side collisions), so
    per-ingest cost scales with the BATCH, not the corpus pair count.
    Candidates verify with exact Jaccard; each batch doc releases
    (batch_id, is_dup, match_id, jaccard) with the best match
    (max jaccard, tie → lowest corpus id).

    Inputs are shingle tables (doc_id, shingles); ids must not collide
    across sides.  ``corpus_banded`` accepts the corpus's already-built
    (and typically persisted) band index so repeat ingests really do
    reuse it — the reuse the docstring promises is CODE at the call
    site (j53 session-caches it per (applicationId, sf_dir), the
    round-10 docstring-vs-code audit)."""
    from pyspark.sql import Window

    cb = corpus_banded if corpus_banded is not None else banded_signatures(corpus_sh)
    bb = banded_signatures(batch_sh)
    cand = (
        bb.alias("b")
        .join(
            cb.alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.key") == F.col("c.key")),
        )
        .select(
            F.col("b.doc_id").alias("batch_id"),
            F.col("c.doc_id").alias("corpus_id"),
        )
        .dropDuplicates(["batch_id", "corpus_id"])
    )
    scored = (
        cand.join(
            batch_sh.select(
                F.col("doc_id").alias("batch_id"), F.col("shingles").alias("sh_b")
            ),
            "batch_id",
        )
        .join(
            corpus_sh.select(
                F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("sh_c")
            ),
            "corpus_id",
        )
        .withColumn(
            "_jac",
            F.size(F.array_intersect("sh_b", "sh_c"))
            / F.size(F.array_union("sh_b", "sh_c")),
        )
        .filter(F.col("_jac") >= tau)
    )
    w = Window.partitionBy("batch_id").orderBy(
        F.col("_jac").desc(), F.col("corpus_id").asc()
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "batch_id",
            F.col("corpus_id").alias("match_id"),
            F.round("_jac", 6).alias("jaccard"),
        )
    )
    return (
        batch_sh.select(F.col("doc_id").alias("batch_id"))
        .join(best, "batch_id", "left")
        .select(
            "batch_id",
            F.col("match_id").isNotNull().alias("is_dup"),
            "match_id",
            "jaccard",
        )
    )


def _j53_oracle() -> str:
    """Structural replay of the batch-vs-corpus banding (the j3 oracle
    discipline): same md5 31-bit shingle hashes, same affine
    permutations, same band tuples, side split by id range, exact
    Jaccard on candidates, best-match window.  The engine's xxhash64
    band keys vs the replay's raw tuples carry j3's documented
    astronomically-unlikely-collision caveat."""
    perms = _perm_constants(_MINHASH_PERMS)
    r = _MINHASH_PERMS // _MINHASH_BANDS
    min_cols = ",\n         ".join(
        f"MIN(({a} * hv + {b}) % {_MERSENNE}) AS m{p}" for p, (a, b) in enumerate(perms)
    )
    bandrows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {band} AS band, {cols} FROM mins".format(
            band=band,
            cols=", ".join(f"m{band * r + i} AS x{i}" for i in range(r)),
        )
        for band in range(_MINHASH_BANDS)
    )
    band_eq = " AND ".join(f"b.x{i} = c.x{i}" for i in range(r))
    return f"""
WITH corpus AS (SELECT doc_id, lower(text) AS t FROM documents),
batch AS (
  SELECT doc_id + 100000 AS doc_id,
         substring(lower(text), instr(lower(text), ' ') + 1) AS t
  FROM documents
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string((string_split(lower(text), ' '))
           [1:greatest(len(string_split(lower(text), ' ')) // 3, 3)], ' ')
  FROM documents WHERE doc_id % 10 = 0
),
allr AS (SELECT * FROM corpus UNION ALL SELECT * FROM batch),
w AS (SELECT doc_id, string_split(t, ' ') AS w FROM allr),
sh AS (SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(len(w) - 2, 1) + 1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
hvt AS (SELECT doc_id,
               ('0x' || substr(md5(g), 1, 15))::BIGINT % {_MERSENNE} AS hv
        FROM inv),
mins AS (SELECT doc_id,
         {min_cols}
         FROM hvt GROUP BY doc_id),
bandrows AS (
{bandrows}
),
cand AS (SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
         FROM bandrows b JOIN bandrows c
           ON b.band = c.band AND {band_eq}
          AND b.doc_id >= 100000 AND c.doc_id < 100000),
scored AS (SELECT batch_id, corpus_id,
                  len(list_intersect(x.s, y.s))::DOUBLE
                    / len(list_distinct(list_concat(x.s, y.s))) AS j
           FROM cand JOIN sh x ON x.doc_id = batch_id
                     JOIN sh y ON y.doc_id = corpus_id
           WHERE len(list_intersect(x.s, y.s))::DOUBLE
                / len(list_distinct(list_concat(x.s, y.s))) >= {_MINHASH_TAU}),
best AS (SELECT batch_id, corpus_id, j,
                ROW_NUMBER() OVER (PARTITION BY batch_id
                                   ORDER BY j DESC, corpus_id ASC) AS rn
         FROM scored)
SELECT b.doc_id AS batch_id,
       (best.corpus_id IS NOT NULL) AS is_dup,
       best.corpus_id AS match_id,
       ROUND(best.j, 6) AS jaccard
FROM batch b LEFT JOIN best ON best.batch_id = b.doc_id AND best.rn = 1
"""


@register("j53_incremental_dedup", oracle=_j53_oracle())
def j53_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """j53 (extension): INCREMENTAL ingest dedup — a new batch checked
    against the existing corpus only (batch × corpus candidates via
    shared LSH bands; the corpus is never re-paired with itself).  The
    batch plants both decision outcomes: one perturbed near-dup per
    corpus doc (first word dropped, id+100000 — must come back is_dup
    with its source as match) and one truncated first-third "new" doc
    per 10th corpus doc (id+200000, Jaccard ≈ 1/3 < τ — must come back
    kept even when banding makes it a candidate, because verification
    is exact).

    Delegates to ``incremental_dedup``; see its docstring for why
    per-ingest cost scales with the batch, not the corpus.  The
    corpus's shingles + band index are session-cached per
    (applicationId, sf_dir) — the across-ingest reuse the engine
    docstring promises, as code (round-10 docstring-vs-code audit):
    repeat invocations pay batch-side cost only."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    key = (spark.sparkContext.applicationId, sf_dir, "j53corpus")
    cached = _J53_CORPUS_CACHE.get(key)
    if cached is None:
        corpus_sh = d.select(
            "doc_id", word_shingles("text", 3).alias("shingles")
        ).persist()
        cb = banded_signatures(corpus_sh).persist()
        cached = cache_put(_J53_CORPUS_CACHE, key, (corpus_sh, cb))
    corpus_sh, corpus_banded = cached
    wsplit = F.split(F.lower(F.col("text")), " ")
    batch = d.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    ).unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.array_join(
                F.slice(
                    wsplit,
                    1,
                    F.greatest((F.size(wsplit) / 3).cast("int"), F.lit(3)),
                ),
                " ",
            ).alias("text"),
        )
    )
    # The batch shingle table feeds THREE consumers inside
    # incremental_dedup (band index build, exact-verify join, released-id
    # projection); without a cut each consumer recomputed the batch scan
    # + text munging + shingling (round-12 measurement: the recompute was
    # ~2.0 s of the 5.3 s invocation at sf0.1).  Repartition first: a
    # per-ingest batch is file-bound to 1-2 scan partitions here while
    # the downstream banding (md5 per shingle x perms) is the CPU-heavy
    # stage, so spread it across the session's parallelism via the
    # guarded spread_small_scan — a no-op when the batch already plans
    # wider than the session (a production-scale batch must not be
    # shuffled DOWN to defaultParallelism).  Eager, not lazy: the band
    # and verify branches run in ONE job, and a lazy checkpoint lets both
    # branches race to compute the partitions before either caches them
    # (measured: eager 3.6 s, lazy 4.1 s, none 5.3 s).  Recomputed every
    # invocation — this is a within-query cut, not a cross-run cache.
    batch_sh = (
        spread_small_scan(batch)
        .select("doc_id", word_shingles("text", 3).alias("shingles"))
        .localCheckpoint(eager=True)
    )
    return incremental_dedup(
        corpus_sh, batch_sh, _MINHASH_TAU, corpus_banded=corpus_banded
    )
