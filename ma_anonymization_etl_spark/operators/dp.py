"""Privacy-mechanism releases (SURVEY §2 i-family extension: i28-i32).

The mechanisms a privacy-preserving ETL publishes alongside its
k-anonymity releases: central ε-DP noisy counts, clipped noisy sums,
a noisy histogram with budget accounting (Dwork 2006; Dwork & Roth
2014, "The Algorithmic Foundations of Differential Privacy"),
LOCAL-DP randomized response for categoricals (Warner 1965), and
fully-synthetic microdata sampled from per-group histograms
(Rubin 1993).

Testability design — deterministic, cross-engine-replicable noise: the
per-group uniform is derived from md5(salt || group-key) (15 hex chars
→ 60-bit int → [0,1)), and the Laplace draw is the closed-form inverse
CDF over it.  Both engines compute the identical expression — Spark via
``conv(substring(md5(·),1,15),16,10)``, DuckDB via
``('0x'||substr(md5(·),1,15))::BIGINT`` — so the ORACLE CHECKS THE
NOISY VALUES THEMSELVES (ROUND(·,6) absorbs last-ulp libm ``ln``
divergence), not just invariants.  A production deployment would swap
``hash_uniform`` for a fresh secret salt per release; everything else
is unchanged.

Scale: every mechanism is one partial-aggregated groupBy over exact
scaled-int64 sums (no doubles in the shuffle), then O(groups) scalar
noise expressions — the same plan shape as d1, and the noise adds zero
shuffle.  100 TB cost is the cost of the underlying aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.operators.anonymize import perturb_laplace
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

_TWO60 = float(1 << 60)


def hash_uniform(key: Column | str, salt: str) -> Column:
    """Deterministic U[0,1) from md5(salt || key) — 60 bits of the hex
    digest.  Replayable in DuckDB: ('0x'||substr(md5(s),1,15))::BIGINT."""
    k = F.col(key) if isinstance(key, str) else key
    hx = F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 15)
    return F.conv(hx, 16, 10).cast("long") / F.lit(_TWO60)


def _sql_uniform(key_expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15))::BIGINT)"
        f" / {_TWO60!r}"
    )


def _sql_laplace(u_expr: str, b: float) -> str:
    """DuckDB replay of anonymize.perturb_laplace's inverse CDF (same
    clamp constants, same operation order)."""
    w = f"GREATEST(-0.5 + 1e-12, LEAST(0.5 - 1e-12, ({u_expr}) - 0.5))"
    return f"(-{b!r} * SIGN({w}) * LN(1 - 2 * ABS({w})))"


def dp_count(df: DataFrame, group: str, epsilon: float, salt: str) -> DataFrame:
    """ε-DP noisy count per group: Laplace(1/ε) on the exact count
    (count sensitivity = 1 under add/remove-one-row adjacency)."""
    u = hash_uniform(group, salt)
    return (
        df.groupBy(group)
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .select(
            group,
            "n_exact",
            F.round(
                perturb_laplace(F.col("n_exact").cast("double"), epsilon, 1.0, 0, uniform=u), 6
            ).alias("n_noisy"),
            F.lit(epsilon).alias("epsilon"),
        )
    )


def dp_sum_clipped(
    df: DataFrame, group: str, col: str, lo: float, hi: float, epsilon: float, salt: str
) -> DataFrame:
    """ε-DP noisy sum: values clipped to [lo, hi] (bounding per-row
    sensitivity at max(|lo|, hi)), exact scaled-int64 sum, Laplace noise
    with b = max(|lo|, hi)/ε."""
    sens = max(abs(lo), abs(hi))
    clipped = F.greatest(F.lit(lo), F.least(F.lit(hi), F.col(col)))
    cents = F.floor(clipped * 100).cast("long")
    u = hash_uniform(group, salt)
    return (
        df.groupBy(group)
        .agg(F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n_exact"))
        .select(
            group,
            (F.col("sum_cents").cast("double") / 100).alias("sum_exact"),
            F.round(
                perturb_laplace(
                    F.col("sum_cents").cast("double") / 100, epsilon, sens, 0, uniform=u
                ),
                6,
            ).alias("sum_noisy"),
            "n_exact",
            F.lit(epsilon).alias("epsilon"),
        )
    )


@register(
    "i28_dp_count",
    oracle=f"""
SELECT c_nationkey,
       COUNT(*) AS n_exact,
       ROUND(COUNT(*) + {_sql_laplace(_sql_uniform('c_nationkey', 'dp28|'), 2.0)}, 6)
         AS n_noisy,
       CAST(0.5 AS DOUBLE) AS epsilon
FROM customer
GROUP BY c_nationkey
""",
)
def i28_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i28: ε-DP noisy customer count per nation (ε=0.5, Laplace b=2).
    The oracle replays the md5-uniform → inverse-CDF draw exactly, so
    the NOISY release itself is hash-checked, not just bounds."""
    c = load(spark, sf_dir, "customer")
    return dp_count(c, "c_nationkey", epsilon=0.5, salt="dp28|")


@register(
    "i29_dp_sum_clipped",
    oracle=f"""
SELECT c_nationkey,
       CAST(SUM(cents) AS DOUBLE) / 100 AS sum_exact,
       ROUND(CAST(SUM(cents) AS DOUBLE) / 100
             + {_sql_laplace(_sql_uniform('c_nationkey', 'dp29|'), 1000.0)}, 6)
         AS sum_noisy,
       COUNT(*) AS n_exact,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM (SELECT c_nationkey,
             CAST(FLOOR(GREATEST(0.0, LEAST(1000.0, c_acctbal)) * 100) AS BIGINT) AS cents
      FROM customer)
GROUP BY c_nationkey
""",
)
def i29_dp_sum_clipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i29: ε-DP noisy sum of account balances per nation, clipped to
    [0, 1000] (sensitivity 1000), ε=1 → Laplace b=1000.  The shuffled
    aggregate is an exact int64 cents sum; noise is O(groups) scalar
    work after it."""
    c = load(spark, sf_dir, "customer")
    return dp_sum_clipped(c, "c_nationkey", "c_acctbal", 0.0, 1000.0, epsilon=1.0, salt="dp29|")


@register(
    "i30_dp_histogram",
    oracle=f"""
SELECT bin,
       COUNT(*) AS n_exact,
       ROUND(COUNT(*) + {_sql_laplace(_sql_uniform('bin', 'dp30|'), 1.0)}, 6) AS n_noisy,
       CAST(1.0 AS DOUBLE) AS epsilon_total,
       'laplace-parallel' AS composition
FROM (SELECT CAST(FLOOR(o_totalprice / 20000) AS BIGINT) * 20000 AS bin FROM orders)
GROUP BY bin
""",
)
def i30_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i30: ε-DP histogram of order totals (width-20000 bins, ε=1).
    Bins partition the rows, so PARALLEL composition applies: one row
    changes one bin → total budget = ε, not ε·n_bins (Dwork & Roth §3.5
    — the accounting the release publishes in `composition`)."""
    o = load(spark, sf_dir, "orders")
    bin_col = (F.floor(F.col("o_totalprice") / 20000).cast("long") * 20000).alias("bin")
    u = hash_uniform("bin", "dp30|")
    return (
        o.select(bin_col)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .select(
            "bin",
            "n_exact",
            F.round(
                perturb_laplace(F.col("n_exact").cast("double"), 1.0, 1.0, 0, uniform=u), 6
            ).alias("n_noisy"),
            F.lit(1.0).alias("epsilon_total"),
            F.lit("laplace-parallel").alias("composition"),
        )
    )


@register(
    "i31_randomized_response",
    oracle=f"""
WITH rr AS (
  SELECT CASE WHEN {_sql_uniform('c_custkey', 'rr1|')} < 0.5 THEN c_mktsegment
              ELSE ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY']
                   [CAST(FLOOR(({_sql_uniform('c_custkey', 'rr2|')}) * 5) AS INT) + 1]
         END AS reported_segment
  FROM customer
),
c AS (SELECT reported_segment, COUNT(*) AS n_reported FROM rr GROUP BY reported_segment)
SELECT reported_segment, n_reported,
       ROUND((n_reported / (SELECT SUM(n_reported)::DOUBLE FROM c) - 0.1) / 0.5, 6)
         AS pi_hat,
       CAST(0.5 AS DOUBLE) AS p_truth
FROM c
""",
)
def i31_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i31: randomized response (Warner 1965) — LOCAL DP for a
    categorical column, the per-record counterpart to the central
    mechanisms i28-i30.  Each customer reports their true market
    segment with p = e^ε/(e^ε + k − 1) and a uniform segment
    otherwise; ε = ln 4, k = 5 make p exactly 0.5 (binary-exact on
    both engines).  The release carries the debiased frequency
    estimator π̂ = (f − (1−p)/k)/p alongside the raw noisy counts.

    Both coin flips are md5-derived from the row key, so the oracle
    replays every per-row decision — the same replicability design as
    i28 (see module docstring).  Scale: one map-side projection, one
    groupBy over k groups, one 5-row window for the total."""
    from pyspark.sql import Window

    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = load(spark, sf_dir, "customer")
    u1 = hash_uniform("c_custkey", "rr1|")
    u2 = hash_uniform("c_custkey", "rr2|")
    reported = F.when(u1 < 0.5, F.col("c_mktsegment")).otherwise(
        F.element_at(F.array(*[F.lit(s) for s in segs]), (F.floor(u2 * 5) + 1).cast("int"))
    )
    counts = (
        c.select(reported.alias("reported_segment"))
        .groupBy("reported_segment")
        .agg(F.count(F.lit(1)).alias("n_reported"))
    )
    total = F.sum("n_reported").over(Window.partitionBy())
    return counts.select(
        "reported_segment",
        "n_reported",
        F.round((F.col("n_reported") / total.cast("double") - 0.1) / 0.5, 6).alias("pi_hat"),
        F.lit(0.5).alias("p_truth"),
    )


@register(
    "i33_dp_quantile",
    oracle=f"""
WITH c AS (
  SELECT c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
), v AS (
  SELECT c_nationkey, cents,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
         LAG(cents) OVER (PARTITION BY c_nationkey ORDER BY cents) AS prev
  FROM c
), iv AS (
  SELECT c_nationkey, rn - 1 AS idx, COALESCE(prev, -100000) AS lo_edge,
         cents AS hi_edge, n
  FROM v
  UNION ALL
  SELECT c_nationkey, MAX(rn) AS idx, MAX(cents) AS lo_edge,
         1000000 AS hi_edge, MAX(rn) AS n
  FROM v GROUP BY c_nationkey
), w AS (
  SELECT *, CASE WHEN ABS(2 * idx - n) >= 40 THEN 0
                 ELSE (hi_edge - lo_edge) << (40 - ABS(2 * idx - n)) END AS wt
  FROM iv
), cum AS (
  SELECT *, SUM(wt) OVER (PARTITION BY c_nationkey ORDER BY idx
                          ROWS UNBOUNDED PRECEDING) AS cw,
            SUM(wt) OVER (PARTITION BY c_nationkey) AS total
  FROM w
), pick AS (
  SELECT c_nationkey, lo_edge, hi_edge,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY idx) AS pr
  FROM cum
  WHERE cw > CAST(FLOOR({_sql_uniform('c_nationkey', 'dpq33|')} * (total::DOUBLE))
                  AS BIGINT)
     OR (total = 0 AND idx = n // 2)
), med AS (
  SELECT c_nationkey, COUNT(*) AS n_exact,
         ROUND(quantile_cont(c_acctbal, 0.5), 4) AS exact_median
  FROM customer GROUP BY c_nationkey
)
SELECT m.c_nationkey, n_exact, exact_median,
       ROUND(((lo_edge + hi_edge) / 2.0) / 100, 6) AS dp_median,
       CAST(2.772589 AS DOUBLE) AS epsilon
FROM med m JOIN pick p ON p.c_nationkey = m.c_nationkey AND p.pr = 1
""",
)
def i33_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i33: ε-DP median via the exponential mechanism (McSherry &
    Talwar 2007; Smith 2011 rank-utility instantiation) — per nation,
    an interval between consecutive order statistics of c_acctbal is
    sampled with probability ∝ width · exp(−(ε/2)·|rank − n/2|), and
    its midpoint is released.  ε = 4·ln 2 makes the weight decay an
    EXACT power of two per rank step, so the whole mechanism runs in
    integer arithmetic: widths are exact cents, weights are
    ``width << (40 − |2·idx − n|)`` (ranks more than 40 halvings from
    the median round to zero weight — a 2⁻⁴⁰ truncation of the tail),
    and the cumulative/threshold comparison is integer-exact in both
    engines — no transcendental in the sampling path, so the oracle
    replays the DRAW itself, like i28-i32 (module docstring).

    Scale: one per-group sort-window pass over the grouped values plus
    an O(groups) draw — the same profile as an exact per-group median
    (d11).  At 100 TB one would swap the exact order statistics for a
    DP-quantile sketch; this is the exact-mechanism reference."""
    from pyspark.sql import Window

    lo_c, hi_c, cap = -100000, 1000000, 40
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    w_ord = Window.partitionBy("c_nationkey").orderBy("cents")
    w_all = Window.partitionBy("c_nationkey")
    v = (
        c.withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn("prev", F.lag("cents").over(w_ord))
    )
    lower = v.select(
        "c_nationkey",
        (F.col("rn") - 1).alias("idx"),
        F.coalesce(F.col("prev"), F.lit(lo_c)).alias("lo_edge"),
        F.col("cents").alias("hi_edge"),
        "n",
    )
    last = v.groupBy("c_nationkey").agg(
        F.max("rn").alias("idx"),
        F.max("cents").alias("lo_edge"),
        F.lit(hi_c).cast("long").alias("hi_edge"),
        F.max("rn").alias("n"),
    )
    iv = lower.unionByName(last.select(*lower.columns))
    k = F.abs(2 * F.col("idx") - F.col("n"))
    wt = F.when(k >= cap, F.lit(0).cast("long")).otherwise(
        F.expr(f"shiftleft(hi_edge - lo_edge, cast({cap} - abs(2 * idx - n) as int))")
    )
    w_cum = w_all.orderBy("idx").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = (
        iv.withColumn("wt", wt)
        .withColumn("cw", F.sum("wt").over(w_cum))
        .withColumn("total", F.sum("wt").over(w_all))
    )
    t = F.floor(hash_uniform("c_nationkey", "dpq33|") * F.col("total").cast("double"))
    # Degenerate-group fallback: if EVERY weight truncated to zero (all
    # near-median intervals zero-width, all nonzero-width intervals past
    # the 2^-40 cutoff — e.g. a heaped constant value), the draw has no
    # mass and the group would silently vanish from the release.  The
    # mechanism then collapses to the deterministic median interval
    # (idx = n div 2) — a degenerate but well-defined release, and the
    # oracle replays the same rule.
    pick = (
        cum.filter(
            (F.col("cw") > t)
            | ((F.col("total") == 0) & (F.col("idx") == F.expr("n div 2")))
        )
        .withColumn("pr", F.row_number().over(w_all.orderBy("idx")))
        .filter(F.col("pr") == 1)
        .select("c_nationkey", "lo_edge", "hi_edge")
    )
    med = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.round(F.percentile("c_acctbal", F.lit(0.5)), 4).alias("exact_median"),
        )
    )
    return med.join(pick, "c_nationkey").select(
        "c_nationkey",
        "n_exact",
        "exact_median",
        F.round((F.col("lo_edge") + F.col("hi_edge")) / 2.0 / 100, 6).alias("dp_median"),
        F.lit(2.772589).alias("epsilon"),
    )


@register(
    "i32_synthetic_marginals",
    oracle=f"""
WITH bins AS (
  SELECT c_nationkey, CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2
),
cdf AS (
  SELECT c_nationkey, bin, cnt,
         SUM(cnt) OVER (PARTITION BY c_nationkey ORDER BY bin) AS cum_hi,
         SUM(cnt) OVER (PARTITION BY c_nationkey ORDER BY bin) - cnt AS cum_lo,
         SUM(cnt) OVER (PARTITION BY c_nationkey) AS n
  FROM bins
),
draws AS (
  SELECT c_custkey AS synth_id, c_nationkey,
         {_sql_uniform('c_custkey', 'syn32|')} AS u
  FROM customer
)
SELECT synth_id, d.c_nationkey,
       CAST(b.bin * 500 + 250.0 AS DOUBLE) AS synth_bal
FROM draws d
JOIN cdf b ON b.c_nationkey = d.c_nationkey
          AND FLOOR(d.u * b.n) >= b.cum_lo AND FLOOR(d.u * b.n) < b.cum_hi
""",
)
def i32_synthetic_marginals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i32: synthetic microdata release — each customer row is replaced
    by a value DRAWN from its nation's account-balance histogram
    (width-500 bins, bin midpoints), so per-nation counts are preserved
    exactly and the balance distribution approximately, while no row
    carries its own value (Rubin 1993 fully-synthetic data, reduced to
    per-group univariate histograms).  synth_id reuses the row key so
    the release is deterministic and oracle-replicable; a production
    deployment would re-key and rotate the draw salt.

    Scale: the histogram/CDF table is O(groups × bins) — broadcast —
    and the draw is a map-side join + range predicate on it; one small
    shuffle builds the CDF, nothing else."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    bins = c.groupBy(
        "c_nationkey", F.floor(F.col("c_acctbal") / 500).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy("c_nationkey").orderBy("bin")
    w_all = Window.partitionBy("c_nationkey")
    cdf = (
        bins.withColumn("cum_hi", F.sum("cnt").over(w_cum))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(w_all))
    )
    draws = c.select(
        F.col("c_custkey").alias("synth_id"),
        "c_nationkey",
        hash_uniform("c_custkey", "syn32|").alias("u"),
    )
    pick = F.floor(F.col("u") * F.col("n"))
    return (
        draws.join(F.broadcast(cdf.drop("cnt")), "c_nationkey")
        .filter((pick >= F.col("cum_lo")) & (pick < F.col("cum_hi")))
        .select(
            "synth_id",
            "c_nationkey",
            (F.col("bin") * 500 + 250.0).alias("synth_bal"),
        )
    )


@register(
    "i38_dp_synthetic",
    oracle=f"""
WITH bins AS (
  SELECT c_nationkey, CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2
), noisy AS (
  SELECT c_nationkey, bin,
         GREATEST(0, CAST(ROUND(cnt +
           {_sql_laplace(_sql_uniform("c_nationkey || '|' || bin", 'dps38|'), 1.0)})
           AS BIGINT)) AS ncnt
  FROM bins
), cdf AS (
  SELECT c_nationkey, bin, ncnt,
         SUM(ncnt) OVER (PARTITION BY c_nationkey ORDER BY bin) AS cum_hi,
         SUM(ncnt) OVER (PARTITION BY c_nationkey ORDER BY bin) - ncnt AS cum_lo,
         SUM(ncnt) OVER (PARTITION BY c_nationkey) AS total
  FROM noisy
), totals AS (
  SELECT DISTINCT c_nationkey, total FROM cdf WHERE total > 0
), draws AS (
  SELECT t.c_nationkey,
         CAST(t.c_nationkey AS VARCHAR) || '#' || CAST(i AS VARCHAR) AS synth_id,
         {_sql_uniform("t.c_nationkey || '#' || i", 'dps38d|')} AS u
  FROM totals t,
       LATERAL (SELECT unnest(range(1, CAST(t.total AS BIGINT) + 1)) AS i) s
)
SELECT synth_id, d.c_nationkey, CAST(b.bin * 500 + 250.0 AS DOUBLE) AS synth_bal,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM draws d
JOIN cdf b ON b.c_nationkey = d.c_nationkey
          AND FLOOR(d.u * b.total) >= b.cum_lo AND FLOOR(d.u * b.total) < b.cum_hi
""",
)
def i38_dp_synthetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i38: DIFFERENTIALLY PRIVATE synthetic microdata — i32's
    histogram-draw release upgraded to ε-DP: the per-(nation, bin)
    histogram is Laplace-noised FIRST (ε=1, parallel composition across
    bins — the i30 mechanism), clamped at zero and re-accumulated into
    a noisy CDF, and EVERYTHING downstream derives from the noisy
    release alone: the number of synthetic rows per nation is the NOISY
    total (not the real row count — publishing exact group sizes would
    be an ε=∞ leak), synth_ids are freshly minted sequence numbers with
    no linkage to any real key, and each row's value is drawn from the
    noisy CDF.  The whole release is a post-processing of the ε-DP
    histogram, so it inherits its guarantee (i32's marginals are exact
    counts over real keys; this is the DP counterpart).  Noise and
    draws are md5-derived, so the oracle replays the entire release,
    clamp and all.

    Scale: identical profile to i32 — one histogram shuffle, a
    broadcast CDF, and the draw side explodes O(Σ noisy-total) rows
    from the tiny per-group totals table before a map-side range join;
    the noise adds O(bins) scalar work."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    bins = c.groupBy(
        "c_nationkey", F.floor(F.col("c_acctbal") / 500).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    u = hash_uniform(
        F.concat(
            F.col("c_nationkey").cast("string"),
            F.lit("|"),
            F.col("bin").cast("string"),
        ),
        "dps38|",
    )
    noisy_cnt = F.greatest(
        F.lit(0).cast("long"),
        F.round(
            perturb_laplace(F.col("cnt").cast("double"), 1.0, 1.0, 0, uniform=u)
        ).cast("long"),
    )
    noisy = bins.select("c_nationkey", "bin", noisy_cnt.alias("ncnt"))
    w_cum = Window.partitionBy("c_nationkey").orderBy("bin")
    w_all = Window.partitionBy("c_nationkey")
    cdf = (
        noisy.withColumn("cum_hi", F.sum("ncnt").over(w_cum))
        .withColumn("cum_lo", F.col("cum_hi") - F.col("ncnt"))
        .withColumn("total", F.sum("ncnt").over(w_all))
    )
    totals = cdf.select("c_nationkey", "total").distinct().filter(F.col("total") > 0)
    draws = totals.select(
        "c_nationkey",
        F.explode(F.expr("sequence(1, total)")).alias("i"),
    ).select(
        "c_nationkey",
        # Collision-free synthetic key (ADVICE r4: an integer stride of
        # 1e6 collides across nations once a noisy total exceeds it —
        # inconsistent with the 100 TB claim).  nation '#' seq is unique
        # by construction at any scale.
        F.concat(
            F.col("c_nationkey").cast("string"),
            F.lit("#"),
            F.col("i").cast("string"),
        ).alias("synth_id"),
        hash_uniform(
            F.concat(
                F.col("c_nationkey").cast("string"),
                F.lit("#"),
                F.col("i").cast("string"),
            ),
            "dps38d|",
        ).alias("u"),
    )
    pick = F.floor(F.col("u") * F.col("total"))
    return (
        draws.join(F.broadcast(cdf.drop("ncnt")), "c_nationkey")
        .filter((pick >= F.col("cum_lo")) & (pick < F.col("cum_hi")))
        .select(
            "synth_id",
            "c_nationkey",
            (F.col("bin") * 500 + 250.0).alias("synth_bal"),
            F.lit(1.0).alias("epsilon"),
        )
    )


def dp_topk(
    df: DataFrame,
    group: str,
    k: int,
    epsilon: float,
    salt: str,
) -> DataFrame:
    """i43's engine: ε-DP TOP-K selection via one-shot noisy counts —
    the peeling-equivalent form of report-noisy-max (Dwork & Roth 2014
    §3.3; Durfee & Rogers, NeurIPS'19 for the one-shot top-k
    equivalence): each group's exact count gets Laplace(k·Δ/ε) noise
    (Δ=1 count sensitivity; dividing ε across the k sequential max
    reports by basic composition), the k noisiest-largest groups are
    released WITH their noisy counts; the exact counts column is not.
    Noise is the deterministic md5 ``hash_uniform`` inverse-CDF draw,
    so the oracle replays selection and values bit-for-bit.

    HONESTY CAVEAT (round-7 review): deterministic replayable noise is
    the repo-wide dual-engine testing device, and here it means the
    mechanism is NOT actually differentially private as shipped — the
    noise is a public function of the group value and an in-repo salt,
    so anyone can recompute it and subtract to recover the exact
    counts.  What this function demonstrates is the MECHANISM (noise
    calibration, composition across the k reports, top-k-on-noisy
    selection) and its plan shape; a production deployment must swap
    ``hash_uniform`` for a secret-keyed PRF or a true entropy source,
    at which point the DP guarantee is real and the oracle replay is
    not.  The same caveat applies to every dp_* release in this
    module.

    Ordering is on the ROUNDED noisy count (6dp) with the group as
    tie-break, so both engines sort identical doubles.

    Plan shape: one partial-agged groupBy (|groups| rows out), noise
    map-side, top-k over |groups| rows — TakeOrderedAndProject; the
    only full-data pass is the count."""
    u = hash_uniform(group, salt)
    noisy = (
        df.groupBy(group)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            group,
            F.round(
                perturb_laplace(F.col("_n").cast("double"), epsilon / k, 1.0, 0, uniform=u),
                6,
            ).alias("n_noisy"),
        )
    )
    from pyspark.sql import Window

    topk = noisy.orderBy(F.col("n_noisy").desc(), F.col(group).asc()).limit(k)
    w = Window.orderBy(F.col("n_noisy").desc(), F.col(group).asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        group, "n_noisy", "rank", F.lit(epsilon).alias("epsilon")
    )


def _i43_oracle() -> str:
    lap = _sql_laplace(_sql_uniform("p_brand", "dp43|"), 5.0)
    return f"""
WITH c AS (SELECT p_brand, COUNT(*) AS n
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1),
nz AS (SELECT p_brand, ROUND(n + {lap}, 6) AS n_noisy FROM c)
SELECT p_brand, n_noisy,
       ROW_NUMBER() OVER (ORDER BY n_noisy DESC, p_brand ASC) AS rank,
       CAST(1.0 AS DOUBLE) AS epsilon
FROM nz ORDER BY n_noisy DESC, p_brand ASC LIMIT 5
"""


@register("i43_dp_topk", oracle=_i43_oracle())
def i43_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i43 (extension): ε-DP top-5 part brands by lineitem volume —
    the private "most popular items" release (the query every
    recommender dashboard wants and the one unprotected counts leak
    most from).  ε=1.0 split across the 5 reports → Laplace(5/ε) per
    count; exact counts never leave the plan.  The broadcast part-dim
    join feeds one partial-agged groupBy; selection and noisy values
    replay exactly in the oracle via the md5 uniform.

    Delegates to ``dp_topk``."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select("p_brand")
    return dp_topk(joined, "p_brand", 5, 1.0, "dp43|")
