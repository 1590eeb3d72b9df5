"""Registry demo queries for the anonymization library — SURVEY.md §2
group I.  One oracle-checked query per deterministic operator; the
stochastic ones (i13-i15) and Mondrian (i22) are rows-only here with
property tests in tests/test_anonymize_props.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.functions.numeric import dsum, sql_dsum
from ma_anonymization_etl_spark.operators import anonymize as A
from ma_anonymization_etl_spark.plans.pipeline import anonymize_pipeline
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

# Shared bin expression: BIGINT bins on both sides (Spark FLOOR(double)
# is already BIGINT; DuckDB's is DOUBLE, hence the cast in SQL).
def _sql_bin(col: str, width: int) -> str:
    return f"CAST(FLOOR({col} / {width}) AS BIGINT) * {width}"


@register(
    "i2_pseudonymize_sha2",
    oracle="""
SELECT c_custkey, sha256('s1|' || c_name) AS name_token FROM customer
""",
)
def i2_pseudonymize_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i2: salted SHA-256 surrogate — cross-engine parity verified
    (Spark sha2(x,256) ≡ DuckDB sha256(x))."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", A.pseudonymize_sha2("c_name", "s1|").alias("name_token"))


@register(
    "i3_pseudonymize_md5",
    oracle="SELECT c_custkey, md5(c_name) AS name_token FROM customer",
)
def i3_pseudonymize_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i3: compact md5 surrogate."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", A.pseudonymize_md5("c_name").alias("name_token"))


@register(
    "i4_tokenize_consistent",
    oracle="""
SELECT c_custkey, DENSE_RANK() OVER (ORDER BY c_mktsegment) AS segment_token
FROM customer
""",
)
def i4_tokenize_consistent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i4: dense integer surrogates (smallest value → 1), rank computed
    over distinct values only then broadcast-joined back."""
    c = load(spark, sf_dir, "customer")
    return A.tokenize_consistent(c, "c_mktsegment", "segment_token").select(
        "c_custkey", "segment_token"
    )


@register(
    "i5_mask_partial",
    oracle="""
SELECT c_custkey,
       repeat('*', GREATEST(LENGTH(c_name) - 4, 0)) || right(c_name, 4) AS name_masked
FROM customer
""",
)
def i5_mask_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i5: partial masking, keep last 4 characters."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", A.mask_partial("c_name", 4).alias("name_masked"))


@register(
    "i6_suppress_columns",
    oracle="""
SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_mktsegment FROM customer
""",
)
def i6_suppress_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i6: schema-preserving suppression — direct identifier nulled."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return A.null_columns(c, ["c_name"])


@register(
    "i7_suppress_rows_cells",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal > 9000 THEN NULL ELSE c_acctbal END AS c_acctbal
FROM customer
WHERE NOT (c_acctbal < -500)
""",
)
def i7_suppress_rows_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i7: row suppression (deep-negative balances) + cell suppression
    (top outliers nulled)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    c = A.suppress_rows_if(c, F.col("c_acctbal") < -500)
    return A.suppress_cell_if(c, "c_acctbal", F.col("c_acctbal") > 9000)


@register(
    "i8_generalize_numeric",
    oracle=f"""
SELECT c_custkey, {_sql_bin('c_acctbal', 100)} AS bal_bin FROM customer
""",
)
def i8_generalize_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i8: fixed-width binning (100-bands; negatives floor toward -inf)."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", A.generalize_numeric("c_acctbal", 100).alias("bal_bin"))


@register(
    "i9_generalize_range_label",
    oracle=f"""
SELECT c_custkey,
       '[' || CAST({_sql_bin('c_acctbal', 500)} AS VARCHAR) || ',' ||
       CAST({_sql_bin('c_acctbal', 500)} + 500 AS VARCHAR) || ')' AS bal_band
FROM customer
""",
)
def i9_generalize_range_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i9: human-readable bands '[500,1000)'."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", A.generalize_range_label("c_acctbal", 500).alias("bal_band"))


@register(
    "i10_generalize_date",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS order_year
FROM orders
""",
)
def i10_generalize_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i10: date generalization to month/year (the DATE-vs-TIMESTAMP
    dialect gotcha handled oracle-side)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        A.generalize_date("o_orderdate", "month").alias("order_month"),
        A.generalize_date("o_orderdate", "year").alias("order_year"),
    )


@register(
    "i11_generalize_hierarchy",
    oracle="""
SELECT c_custkey, r_name AS region
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
""",
)
def i11_generalize_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i11: replace nation with its region ancestor via broadcast
    hierarchy join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    hier = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    return A.generalize_hierarchy(c, "c_nationkey", hier, "n_nationkey", "r_name", "region").select(
        "c_custkey", "region"
    )


@register(
    "i12_top_bottom_code",
    oracle="""
WITH q AS (SELECT quantile_cont(c_acctbal, 0.05) AS lo,
                  quantile_cont(c_acctbal, 0.95) AS hi
           FROM customer)
SELECT c_custkey,
       ROUND(LEAST(GREATEST(c_acctbal, lo), hi), 4) AS bal_coded
FROM customer, q
""",
)
def i12_top_bottom_code(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i12: clamp tails to exact 5th/95th percentiles (outlier guard);
    ROUND(4) both sides on the interpolated bounds."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    coded = A.top_bottom_code(c, "c_acctbal", 0.05, 0.95, out="bal_coded")
    return coded.select("c_custkey", F.round("bal_coded", 4).alias("bal_coded"))


@register(
    "i13_perturb_uniform",
    # Spark's seeded RNG stream is engine-specific, so the checkable
    # projection is the i18 pattern: exact row count + seed-stable bounds
    # booleans the oracle emits as TRUE.  The raw per-row release is the
    # same expression (property-tested in tests/test_anonymize_props.py).
    oracle="""
SELECT COUNT(*) AS n_rows, TRUE AS dev_bounded, TRUE AS mean_centered
FROM customer
""",
)
def i13_perturb_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i13: seeded additive uniform noise (scale 100) on the sensitive
    attribute — verified via its invariants: every deviation within
    ±scale/2, empirical mean-deviation near 0."""
    c = load(spark, sf_dir, "customer")
    dev = A.perturb_uniform("c_acctbal", scale=100.0, seed=42) - F.col("c_acctbal")
    return c.select(dev.alias("dev")).agg(
        F.count("*").alias("n_rows"),
        (F.max(F.abs(F.col("dev"))) <= F.lit(50.0)).alias("dev_bounded"),
        (F.abs(F.avg("dev")) < F.lit(10.0)).alias("mean_centered"),
    )


@register(
    "i14_perturb_laplace",
    oracle="""
SELECT COUNT(*) AS n_rows, TRUE AS all_finite, TRUE AS roughly_symmetric,
       TRUE AS scale_plausible
FROM customer
""",
)
def i14_perturb_laplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i14: DP-style Laplace noise (ε=1, sensitivity=100), closed-form
    inverse-CDF — verified via its invariants: all draws finite (the
    clamped tail), sign roughly balanced, mean |noise| near b=100."""
    c = load(spark, sf_dir, "customer")
    noise = A.perturb_laplace(
        "c_acctbal", epsilon=1.0, sensitivity=100.0, seed=7
    ) - F.col("c_acctbal")
    frac_neg = F.avg((F.col("noise") < 0).cast("double"))
    return c.select(noise.alias("noise")).agg(
        F.count("*").alias("n_rows"),
        (F.max(F.abs(F.col("noise"))) < F.lit(1e6)).alias("all_finite"),
        ((frac_neg > 0.4) & (frac_neg < 0.6)).alias("roughly_symmetric"),
        F.avg(F.abs(F.col("noise"))).between(60.0, 160.0).alias("scale_plausible"),
    )


@register(
    "i15_swap_within_group",
    # A within-group permutation preserves each group's value multiset
    # exactly, so the per-group exact sum/count/min/max of the SWAPPED
    # column must equal the oracle's over the ORIGINAL column — a swap
    # that drops, duplicates, or leaks rows across groups breaks it.
    oracle=f"""
SELECT c_nationkey, COUNT(*) AS n,
       {sql_dsum('c_acctbal', 'sum_bal')},
       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM customer GROUP BY c_nationkey
""",
)
def i15_swap_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i15: permute balances among same-nation rows (rank-matching two
    seeded shuffles) — verified via multiset preservation per group."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    swapped = A.swap_within_group(c, "c_acctbal", ["c_nationkey"], seed=42)
    return swapped.groupBy("c_nationkey").agg(
        F.count("*").alias("n"),
        dsum("c_acctbal", "sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "i16_k_anonymity_metric",
    oracle="""
SELECT MIN(cnt) AS k_anonymity, COUNT(*) AS n_classes
FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_nationkey, c_mktsegment)
""",
)
def i16_k_anonymity_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i16: k = size of the smallest equivalence class over the QIs."""
    c = load(spark, sf_dir, "customer")
    return A.k_anonymity_metric(c, ["c_nationkey", "c_mktsegment"])


@register(
    "i17_k_enforce_suppress",
    oracle="""
SELECT c_custkey, c_nationkey, c_mktsegment FROM (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS cnt
  FROM customer
) WHERE cnt >= 10
""",
)
def i17_k_enforce_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i17: drop rows in equivalence classes smaller than k=10."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment")
    return A.k_enforce_suppress(c, ["c_nationkey", "c_mktsegment"], k=10)


_I18_LEVELS = [100, 500, 2000, 10000]
_I18_K = 8


def _i18_oracle() -> str:
    ks = ",\n".join(
        f"k{i} AS (SELECT MIN(cnt) AS k FROM (SELECT COUNT(*) AS cnt FROM customer "
        f"GROUP BY c_nationkey, {_sql_bin('c_acctbal', w)}))"
        for i, w in enumerate(_I18_LEVELS)
    )
    val_cases = "\n".join(
        f"  WHEN (SELECT k FROM k{i}) >= {_I18_K} THEN {_sql_bin('c_acctbal', w)}"
        for i, w in enumerate(_I18_LEVELS[:-1])
    )
    lvl_cases = "\n".join(
        f"  WHEN (SELECT k FROM k{i}) >= {_I18_K} THEN {i}"
        for i, w in enumerate(_I18_LEVELS[:-1])
    )
    last = len(_I18_LEVELS) - 1
    return f"""
WITH {ks}
SELECT c_custkey, c_nationkey,
CASE\n{val_cases}
  ELSE {_sql_bin('c_acctbal', _I18_LEVELS[-1])} END AS acctbal_gen,
CAST(CASE\n{lvl_cases}
  ELSE {last} END AS INTEGER) AS gen_level
FROM customer
"""


@register("i18_k_enforce_generalize", oracle=_i18_oracle())
def i18_k_enforce_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i18: full-domain generalization — coarsen the acctbal bins
    (100 → 500 → 2000 → 10000) until every (nation, bin) class has ≥ 8
    rows.  The oracle mirrors the adaptive choice with scalar
    subqueries per ladder level, so this *adaptive* op is fully
    hash-checked (Samarati/Sweeney full-domain generalization)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    ladder = [
        (f"bin{w}", A.generalize_numeric("c_acctbal", w)) for w in _I18_LEVELS
    ]
    out, _level = A.k_enforce_generalize(
        c, ["c_nationkey"], _I18_K, ladder, "acctbal_gen"
    )
    return out.select("c_custkey", "c_nationkey", "acctbal_gen", "gen_level")


@register(
    "i19_l_diversity",
    oracle=f"""
SELECT c_custkey, c.c_nationkey, c.c_mktsegment
FROM customer c
JOIN (SELECT c_nationkey, c_mktsegment FROM customer
      GROUP BY c_nationkey, c_mktsegment
      HAVING COUNT(DISTINCT {_sql_bin('c_acctbal', 1000)}) >= 3) ok
  ON c.c_nationkey = ok.c_nationkey AND c.c_mktsegment = ok.c_mktsegment
""",
)
def i19_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i19: keep rows only in classes with ≥ 3 distinct sensitive bins
    (grouped subquery + semi join — COUNT(DISTINCT) OVER isn't
    portable)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment",
        A.generalize_numeric("c_acctbal", 1000).alias("sa_bin"),
    )
    kept = A.l_diversity_enforce(c, ["c_nationkey", "c_mktsegment"], "sa_bin", 3)
    return kept.select("c_custkey", "c_nationkey", "c_mktsegment")


@register(
    "i20_t_closeness",
    oracle="""
WITH g AS (SELECT c_mktsegment,
                  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM customer) AS p_global
           FROM customer GROUP BY c_mktsegment),
ct AS (SELECT c_nationkey, COUNT(*) AS n_class FROM customer GROUP BY c_nationkey),
cd AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cell
       FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT c_nationkey,
       ROUND(0.5 * (SUM(ABS(CAST(n_cell AS DOUBLE) / n_class - p_global))
                    + (1 - SUM(p_global))), 6) AS t_closeness
FROM cd JOIN ct USING (c_nationkey) JOIN g USING (c_mktsegment)
GROUP BY c_nationkey
""",
)
def i20_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i20: per-class total-variation distance of the segment
    distribution vs global (absent categories contribute their global
    mass — folded in as 1 - Σ p_global_present)."""
    c = load(spark, sf_dir, "customer")
    return A.t_closeness_metric(c, ["c_nationkey"], "c_mktsegment")


@register(
    "i21_uniqueness_risk",
    oracle=f"""
SELECT CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS frac_singleton_classes,
       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / SUM(cnt)
         AS frac_unique_rows
FROM (SELECT COUNT(*) AS cnt FROM customer
      GROUP BY c_nationkey, c_mktsegment, {_sql_bin('c_acctbal', 100)})
""",
)
def i21_uniqueness_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i21: re-identification risk — singleton-class share and unique-row
    share on fine QIs (exact rational divisions, engine-identical)."""
    c = load(spark, sf_dir, "customer").withColumn(
        "bal_bin", A.generalize_numeric("c_acctbal", 100)
    )
    return A.uniqueness_risk(c, ["c_nationkey", "c_mktsegment", "bal_bin"])


@register(
    "i34_k_map",
    oracle=f"""
WITH pop AS (
  SELECT c_nationkey, c_mktsegment, {_sql_bin('c_acctbal', 500)} AS bal_bin,
         COUNT(*) AS k_population
  FROM customer GROUP BY 1, 2, 3
), samp AS (
  SELECT c_nationkey, c_mktsegment, {_sql_bin('c_acctbal', 500)} AS bal_bin,
         COUNT(*) AS n_sample
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY 1, 2, 3
)
SELECT s.c_nationkey, s.c_mktsegment, s.bal_bin, n_sample, k_population,
       (k_population < 5) AS risky
FROM samp s JOIN pop p
  ON p.c_nationkey = s.c_nationkey AND p.c_mktsegment = s.c_mktsegment
 AND p.bal_bin = s.bal_bin
""",
)
def i34_k_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i34: k-map — the population-aware counterpart to k-anonymity
    (El Emam & Dankar, JAMIA 2008).  k-anonymity (i16) measures class
    sizes INSIDE the released sample; k-map measures each released
    record's class size in the POPULATION the adversary actually
    matches against, which is the defensible risk number when only a
    subset is released.  Here the full customer table plays the
    population and the customers with ≥1 order play the released
    sample; a class is risky when fewer than 5 population records
    share its QIs.

    Scale: two QI-keyed partial aggregates + one join on the QI key —
    both sides are already class-grained (tiny vs the row counts), and
    the sample side derives from a semi-join that never widens rows."""
    c = load(spark, sf_dir, "customer").withColumn(
        "bal_bin", A.generalize_numeric("c_acctbal", 500)
    )
    qis = ["c_nationkey", "c_mktsegment", "bal_bin"]
    pop = c.groupBy(*qis).agg(F.count(F.lit(1)).alias("k_population"))
    o = load(spark, sf_dir, "orders").select("o_custkey")
    samp = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(*qis)
        .agg(F.count(F.lit(1)).alias("n_sample"))
    )
    return samp.join(pop, qis).select(
        *qis, "n_sample", "k_population", (F.col("k_population") < 5).alias("risky")
    )


@register(
    "i40_microaggregation",
    oracle="""
WITH r AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
), g AS (
  SELECT *, LEAST((rn - 1) // 10, n // 10 - 1) AS grp FROM r
), m AS (
  SELECT c_nationkey, grp, COUNT(*) AS grp_size,
         (CAST(SUM(cents) AS DOUBLE) / 100) / COUNT(*) AS grp_mean
  FROM g GROUP BY 1, 2
)
SELECT g.c_custkey, g.c_nationkey, g.grp, m.grp_size,
       CASE WHEN g.n >= 10 THEN ROUND(m.grp_mean, 4) END AS micro_bal
FROM g JOIN m ON m.c_nationkey = g.c_nationkey AND m.grp = g.grp
""",
)
def i40_microaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i40: univariate MICROAGGREGATION (Domingo-Ferrer & Mateo-Sanz,
    TKDE 2002) — the SDC method the i-family still lacked: within each
    class, sort the sensitive values and replace each run of k=10
    consecutive records with their group mean, so every published value
    is shared by ≥ k records (k-anonymity on the VALUE) while rank
    structure survives.  The trailing partial group merges into its
    predecessor (standard rule — group sizes k..2k−1), groups are
    deterministic (value + key tie-break), and means come from exact
    cents sums, so the oracle replays the whole release.  A class with
    n < k cannot form any ≥k-shared group, so its micro_bal is
    suppressed to NULL (no raw value ever publishes).  Sorted
    fixed-size grouping is the OPTIMAL univariate partition; the
    multivariate generalization (MDAV) is Mondrian-adjacent and
    driver-iterative (i22's shape).

    Scale: one window shuffle on the class key + one group-mean
    aggregate over #classes·(n/k) tiny groups — i15/i37's profile."""
    from pyspark.sql import Window

    k = 10
    w_ord = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    w_all = Window.partitionBy("c_nationkey")
    r = (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    g = r.withColumn(
        "grp",
        F.least(
            F.expr(f"(rn - 1) div {k}"), F.expr(f"n div {k} - 1")
        ),
    )
    m = g.groupBy("c_nationkey", "grp").agg(
        F.count(F.lit(1)).alias("grp_size"),
        ((F.sum("cents").cast("double") / 100) / F.count(F.lit(1))).alias("grp_mean"),
    )
    return g.join(m, ["c_nationkey", "grp"]).select(
        "c_custkey",
        "c_nationkey",
        "grp",
        "grp_size",
        F.when(F.col("n") >= k, F.round("grp_mean", 4)).alias("micro_bal"),
    )


@register(
    "i37_rank_swap",
    oracle="""
WITH r AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         ROW_NUMBER() OVER w AS rn,
         LEAD(c_acctbal) OVER w AS nxt,
         LAG(c_acctbal) OVER w AS prv
  FROM customer
  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
)
SELECT c_custkey, c_nationkey,
       CASE WHEN rn % 2 = 1 THEN COALESCE(nxt, c_acctbal) ELSE prv END
         AS swapped_bal
FROM r
""",
)
def i37_rank_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i37: rank swapping (Moore 1996), deterministic adjacent-pair
    variant — within each class the SA values are sorted and swapped
    between rank neighbours (1↔2, 3↔4, …; an odd last rank keeps its
    value).  Unlike i15's seeded permutation, the pairing is itself
    deterministic, so the oracle replays the whole release: per-class
    multiset preserved EXACTLY and every value displaced at most one
    rank (maximal utility).  A record keeps its own value when its
    rank-neighbour holds an EQUAL value (the swap is then a no-op —
    ties are indistinguishable, so nothing is leaked beyond the value's
    multiplicity) and at an unpaired odd last rank.
    In SDC practice the swap window is p% of ranks; window=1 is the
    strongest-utility instance of the family.

    Scale: one window shuffle on the class key — i15's exact profile."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    c = load(spark, sf_dir, "customer")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .withColumn("nxt", F.lead("c_acctbal").over(w))
        .withColumn("prv", F.lag("c_acctbal").over(w))
        .select(
            "c_custkey",
            "c_nationkey",
            F.when(
                F.col("rn") % 2 == 1,
                F.coalesce(F.col("nxt"), F.col("c_acctbal")),
            )
            .otherwise(F.col("prv"))
            .alias("swapped_bal"),
        )
    )


@register(
    "i36_entropy_l_diversity",
    oracle="""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2
), cls AS (
  SELECT c_nationkey, SUM(cnt) AS n, COUNT(*) AS nd FROM cells GROUP BY 1
), e AS (
  SELECT cells.c_nationkey, cnt, n, nd,
         CAST(ROUND(ln(cnt::DOUBLE / n) * 1000000) AS BIGINT) AS lnp6
  FROM cells JOIN cls USING (c_nationkey)
), agg AS (
  SELECT c_nationkey, CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(nd) AS BIGINT) AS n_distinct_sa,
         ((-SUM(cnt * lnp6)) // MAX(n)) AS e6
  FROM e GROUP BY c_nationkey
)
SELECT c_nationkey, n, n_distinct_sa,
       e6 / 1000000.0 AS entropy_nats,
       (e6 >= 1098612) AS passes_entropy_l3
FROM agg
""",
)
def i36_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i36: ENTROPY l-diversity (Machanavajjhala 2007 §4.1) — the
    stricter cousin of i19's distinct-count check: a class passes iff
    the Shannon entropy of its SA distribution is ≥ ln(l), which a
    class dominated by one SA value fails even when l distinct values
    are nominally present.  Arithmetic follows j30's micro-nat
    discipline: per-cell ln(p) is rounded to integer micro-nats, the
    per-class accumulation is an integer sum + integer division (order
    independent, engine-identical), and the l=3 gate compares against
    ⌊ln(3)·10⁶⌋ = 1098612 in integers.

    Scale: two class-grained aggregates (cells, then classes) — the
    entropy itself costs nothing beyond i19's shuffles."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("c_nationkey")
    e = cells.withColumn("n", F.sum("cnt").over(w)).withColumn(
        "nd", F.count(F.lit(1)).over(w)
    )
    lnp6 = F.round(F.log(F.col("cnt").cast("double") / F.col("n")) * 1000000).cast(
        "long"
    )
    agg = (
        e.withColumn("lnp6", lnp6)
        .groupBy("c_nationkey")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("nd").cast("long").alias("n_distinct_sa"),
            F.expr("(-sum(cnt * lnp6)) div max(n)").alias("e6"),
        )
    )
    return agg.select(
        "c_nationkey",
        "n",
        "n_distinct_sa",
        (F.col("e6") / 1000000.0).alias("entropy_nats"),
        (F.col("e6") >= 1098612).alias("passes_entropy_l3"),
    )


@register(
    "i35_cell_suppression",
    oracle="""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
  FROM customer GROUP BY 1, 2
), flagged AS (
  SELECT *, (cnt < 5) AS prim,
         SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END)
           OVER (PARTITION BY c_nationkey) AS n_prim,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY (cnt < 5), cnt, c_mktsegment) AS rn
  FROM cells
)
SELECT c_nationkey, c_mktsegment,
       CASE WHEN prim THEN 'primary'
            WHEN n_prim = 1 AND rn = 1 THEN 'complementary'
            ELSE 'ok' END AS status,
       CASE WHEN prim OR (n_prim = 1 AND rn = 1) THEN NULL
            ELSE cnt END AS published
FROM flagged
""",
)
def i35_cell_suppression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i35: frequency-table cell suppression with one-round
    complementary suppression (SDC tabular-data protection; Willenborg
    & de Waal 2001 ch. 4) — cells under the threshold (n < 5) are
    PRIMARY-suppressed, and any row left with exactly ONE suppressed
    cell gets its smallest remaining cell suppressed too, so the
    missing value cannot be recovered from the published row total.
    Optimal complementary suppression is NP-hard; the greedy one-round
    row pass is the standard first-cut release rule and is fully
    deterministic here (tie-break on segment), so the oracle replays
    the entire decision.

    Scale: one QI-grained aggregate plus two windows over the CELL
    table (#classes rows) — cost is the frequency aggregate, the
    suppression logic is free."""
    c = load(spark, sf_dir, "customer")
    return A.cell_suppression_release(c, ["c_nationkey", "c_mktsegment"], threshold=5)


@register(
    "i24_utility_metrics",
    oracle="""
SELECT COUNT(*) AS n_classes,
       ROUND(AVG(cnt), 4) AS avg_class_size,
       CAST(SUM(cnt * cnt) AS BIGINT) AS discernibility,
       ROUND((CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) / 10, 4) AS c_avg
FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_nationkey, c_mktsegment)
""",
)
def i24_utility_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i24: information-loss report (class count, avg class size,
    discernibility Σ|class|², C_avg vs k=10) — the utility half of the
    privacy/utility trade-off the risk metrics (i16/i21) measure."""
    c = load(spark, sf_dir, "customer")
    return A.utility_metrics(c, ["c_nationkey", "c_mktsegment"], k=10)


# Mondrian partitions are algorithm-specific (pid layout, cut points),
# but the RELEASE INVARIANTS are not: every input row is in exactly one
# class, every class has ≥ k rows, and every row's QI values sit inside
# its class's published [lo, hi] ranges.  The registered queries project
# those invariants (exact row count + booleans the oracle emits as TRUE)
# — the i18 pattern; the raw releases stay property-tested in
# tests/test_anonymize_props.py.
_MONDRIAN_ORACLE = """
SELECT COUNT(*) AS n_rows, TRUE AS k_satisfied, TRUE AS rows_within_ranges
FROM customer
"""


def _mondrian_invariants(out: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    sizes = F.count("*").over(Window.partitionBy("mondrian_pid"))
    within = (
        F.col("c_acctbal").between(F.col("c_acctbal_lo"), F.col("c_acctbal_hi"))
        & F.col("c_nationkey").between(
            F.col("c_nationkey_lo"), F.col("c_nationkey_hi")
        )
    )
    return out.select(
        sizes.alias("cls_n"), within.alias("within")
    ).agg(
        F.count("*").alias("n_rows"),
        (F.min("cls_n") >= k).alias("k_satisfied"),
        F.min("within").alias("rows_within_ranges"),
    )


@register("i22_mondrian_kanon", oracle=_MONDRIAN_ORACLE)
def i22_mondrian_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i22: Mondrian multidimensional k-anonymity (k=25) over
    (c_acctbal, c_nationkey) — recursive median splits, stats-only to
    driver, split decisions re-broadcast.  Checked via release
    invariants (see _MONDRIAN_ORACLE comment)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return _mondrian_invariants(
        A.mondrian_kanon(c, ["c_acctbal", "c_nationkey"], k=25), k=25
    )


@register("i22b_mondrian_relaxed", oracle=_MONDRIAN_ORACLE)
def i22b_mondrian_relaxed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i22 (relaxed variant): rank-balanced Mondrian — zero per-level
    stats jobs (sizes evolve ⌊n/2⌋/⌈n/2⌉ driver-side from one count),
    class sizes land in [k, 2k-1].  Checked via release invariants."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return _mondrian_invariants(
        A.mondrian_kanon_relaxed(c, ["c_acctbal", "c_nationkey"], k=25), k=25
    )


@register("i22c_mondrian_hybrid", oracle=_MONDRIAN_ORACLE)
def i22c_mondrian_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i22c: hybrid Mondrian — strict median splits for the top levels
    (fully parallel broadcast decisions), relaxed rank-balanced inside
    each coarse partition (windows keyed on many pids).  The shape that
    runs at 100 TB: no single-partition window ever sees the full table.
    Checked via release invariants."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return _mondrian_invariants(
        A.mondrian_kanon_hybrid(c, ["c_acctbal", "c_nationkey"], k=25, strict_levels=3),
        k=25,
    )


@register(
    "i25_mondrian_utility_compare",
    oracle="""
SELECT mode, (SELECT COUNT(*) FROM customer) AS n_rows,
       TRUE AS k_satisfied, TRUE AS ncp_valid
FROM (VALUES ('strict'), ('relaxed')) AS t(mode)
""",
)
def i25_mondrian_utility_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i25: strict-vs-relaxed Mondrian information loss on the same QIs —
    class stats + per-tuple NCP (Xu et al. KDD 2006).  NCP values are
    partitioner-specific, so the checkable projection is per-mode row
    accounting (classes × avg size re-totals the input) plus k and
    NCP-range booleans; the full comparison table remains available via
    ``A.mondrian_utility_compare`` and is asserted in property tests."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    cmp_ = A.mondrian_utility_compare(c, ["c_acctbal", "c_nationkey"], k=25)
    return cmp_.select(
        "mode",
        "n_rows",
        (F.col("min_class_size") >= 25).alias("k_satisfied"),
        F.col("avg_ncp").between(0.0, 1.0).alias("ncp_valid"),
    )


@register(
    "i23_anonymize_pipeline",
    oracle="""
WITH t AS (
  SELECT sha256('demo|' || c_name) AS name_token,
         c_nationkey,
         CAST(FLOOR(c_acctbal / 500) AS BIGINT) * 500 AS bal_bin
  FROM customer
), counted AS (
  SELECT *, COUNT(*) OVER (PARTITION BY c_nationkey, bal_bin) AS cnt FROM t
)
SELECT name_token, c_nationkey, bal_bin FROM counted WHERE cnt >= 8
""",
)
def i23_anonymize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i23: the config-driven route — pseudonymize DI, generalize SA into
    a QI bin, k-enforce, project.  One lazy Catalyst plan end to end."""
    c = load(spark, sf_dir, "customer")
    route = [
        {"op": "pseudonymize_sha2", "col": "c_name", "salt": "demo|", "out": "name_token"},
        {"op": "generalize_numeric", "col": "c_acctbal", "width": 500, "out": "bal_bin"},
        {"op": "k_enforce_suppress", "qis": ["c_nationkey", "bal_bin"], "k": 8},
        {"op": "select", "cols": ["name_token", "c_nationkey", "bal_bin"]},
    ]
    return anonymize_pipeline(c, route)


@register(
    "i39_cross_table_pseudo_join",
    oracle="""
WITH ct AS (
  SELECT sha256('xt39|' || CAST(c_custkey AS VARCHAR)) AS token FROM customer
), ot AS (
  SELECT sha256('xt39|' || CAST(o_custkey AS VARCHAR)) AS token FROM orders
), raw AS (
  SELECT COUNT(*) AS n_raw_join
  FROM orders JOIN customer ON o_custkey = c_custkey
), tok AS (
  SELECT COUNT(*) AS n_token_join FROM ot JOIN ct USING (token)
)
SELECT (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS n_customers,
       (SELECT COUNT(DISTINCT token) FROM ct) AS n_tokens,
       n_raw_join, n_token_join,
       (n_raw_join = n_token_join
        AND (SELECT COUNT(DISTINCT c_custkey) FROM customer)
            = (SELECT COUNT(DISTINCT token) FROM ct)) AS integrity_preserved
FROM raw CROSS JOIN tok
""",
)
def i39_cross_table_pseudo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i39: referential-integrity-preserving pseudonymization PROVED
    across tables — the property i2 promises ('same input → same token,
    so joins still work') demonstrated as a release: customer and
    orders both pseudonymize their shared key with the same salted
    sha256, and the report certifies (a) token cardinality equals key
    cardinality (no collisions introduced) and (b) the token join
    reproduces the raw join's cardinality exactly.  This is the check a
    multi-table anonymization route runs before dropping the raw keys —
    a route that salted the two tables differently fails it instantly.

    Scale: two map-side projections + one join on the token (same
    shuffle profile as the raw join) + key-only distinct counts."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    tok = lambda col: F.sha2(  # noqa: E731
        F.concat(F.lit("xt39|"), F.col(col).cast("string")), 256
    )
    ct = c.select(tok("c_custkey").alias("token"))
    ot = o.select(tok("o_custkey").alias("token"))
    raw = (
        o.join(c, o.o_custkey == c.c_custkey)
        .agg(F.count(F.lit(1)).alias("n_raw_join"))
    )
    tokj = ot.join(ct, "token").agg(F.count(F.lit(1)).alias("n_token_join"))
    cards = c.agg(
        F.countDistinct("c_custkey").alias("n_customers")
    ).crossJoin(ct.agg(F.countDistinct("token").alias("n_tokens")))
    return (
        cards.crossJoin(raw)
        .crossJoin(tokj)
        .select(
            "n_customers",
            "n_tokens",
            "n_raw_join",
            "n_token_join",
            (
                (F.col("n_raw_join") == F.col("n_token_join"))
                & (F.col("n_customers") == F.col("n_tokens"))
            ).alias("integrity_preserved"),
        )
    )


_I41_P_KEEP = 0.8  # PRAM diagonal: P(released = original)


def _i41_oracle() -> str:
    from ma_anonymization_etl_spark.operators.dp import _sql_uniform

    u = _sql_uniform("c.c_custkey", "i41")
    return f"""
WITH cats AS (
  SELECT seg, ROW_NUMBER() OVER (ORDER BY seg) - 1 AS idx
  FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer)
),
k AS (SELECT COUNT(*) AS k FROM cats),
drawn AS (
  SELECT c.c_mktsegment AS orig, cat.idx AS own, {u} AS u, k.k
  FROM customer c JOIN cats cat ON cat.seg = c.c_mktsegment, k
),
released AS (
  SELECT orig,
         CASE WHEN u < {_I41_P_KEEP} THEN own
              ELSE CASE
                WHEN CAST(FLOOR((u - {_I41_P_KEEP})
                          / ((1.0 - {_I41_P_KEEP}) / (CAST(k AS DOUBLE) - 1.0)))
                     AS BIGINT) < own
                THEN CAST(FLOOR((u - {_I41_P_KEEP})
                          / ((1.0 - {_I41_P_KEEP}) / (CAST(k AS DOUBLE) - 1.0)))
                     AS BIGINT)
                ELSE CAST(FLOOR((u - {_I41_P_KEEP})
                          / ((1.0 - {_I41_P_KEEP}) / (CAST(k AS DOUBLE) - 1.0)))
                     AS BIGINT) + 1
              END END AS rel_idx
  FROM drawn
)
SELECT r.orig, c2.seg AS released, COUNT(*) AS n
FROM released r JOIN cats c2 ON c2.idx = r.rel_idx
GROUP BY r.orig, c2.seg
"""


@register("i41_pram_categorical", oracle=_i41_oracle())
def i41_pram_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i41: PRAM (Post-RAndomization Method, Gouweleeuw et al. 1998) —
    the general categorical perturbation i31's binary randomized
    response is a special case of: each record keeps its category with
    p = 0.8, otherwise transitions uniformly to one of the k-1 others.
    The draw is the md5-derived U[0,1) keyed on c_custkey, so the
    DuckDB oracle replays every transition; the released artifact here
    is the orig x released TRANSITION MATRIX (k x k counts), which is
    exactly what a downstream bias-correcting estimator (the PRAM
    matrix inverse) consumes.

    Scale: the category dictionary (k rows, window-numbered) is a
    broadcast; the transition itself is ONE map-side expression per
    row — no shuffle beyond the final k x k rollup.  A non-uniform
    transition matrix swaps the closed-form bucket for a per-category
    cumulative-probability lookup in the same broadcast."""
    from pyspark.sql import Window

    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    c = load(spark, sf_dir, "customer")
    cats = (
        c.select(F.col("c_mktsegment").alias("seg"))
        .distinct()
        .withColumn("idx", F.row_number().over(Window.orderBy("seg")) - 1)
    )
    k = cats.agg(F.count(F.lit(1)).alias("k"))
    p = F.lit(_I41_P_KEEP)
    j = F.floor(
        (F.col("u") - p) / ((F.lit(1.0) - p) / (F.col("k").cast("double") - F.lit(1.0)))
    ).cast("long")
    drawn = (
        c.join(F.broadcast(cats), F.col("c_mktsegment") == F.col("seg"))
        .crossJoin(F.broadcast(k))
        .select(
            F.col("c_mktsegment").alias("orig"),
            F.col("idx").alias("own"),
            hash_uniform("c_custkey", "i41").alias("u"),
            "k",
        )
    )
    released = drawn.select(
        "orig",
        F.when(F.col("u") < p, F.col("own"))
        .otherwise(F.when(j < F.col("own"), j).otherwise(j + 1))
        .alias("rel_idx"),
    )
    return (
        released.join(
            F.broadcast(cats.select(F.col("idx").alias("rel_idx"), F.col("seg").alias("released"))),
            "rel_idx",
        )
        .groupBy("orig", "released")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "i42_t_closeness_enforce",
    oracle="""
WITH g AS (SELECT c_mktsegment,
                  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM customer) AS p_global
           FROM customer GROUP BY c_mktsegment),
ct AS (SELECT c_nationkey, COUNT(*) AS n_class FROM customer GROUP BY c_nationkey),
cd AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cell
       FROM customer GROUP BY c_nationkey, c_mktsegment),
t AS (SELECT c_nationkey,
             ROUND(0.5 * (SUM(ABS(CAST(n_cell AS DOUBLE) / n_class - p_global))
                          + (1 - SUM(p_global))), 6) AS t_closeness
      FROM cd JOIN ct USING (c_nationkey) JOIN g USING (c_mktsegment)
      GROUP BY c_nationkey),
ranked AS (SELECT c_nationkey, t_closeness,
                  ROW_NUMBER() OVER (ORDER BY t_closeness, c_nationkey) AS rn,
                  COUNT(*) OVER () AS n_classes
           FROM t)
SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, r.t_closeness
FROM customer c JOIN ranked r ON r.c_nationkey = c.c_nationkey
WHERE r.rn * 2 <= r.n_classes
""",
)
def i42_t_closeness_enforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i42: t-closeness ENFORCEMENT — the release step i20's metric
    feeds (the i16→i17 measure→enforce symmetry, completed for t):
    classes are ranked by their sensitive-attribute divergence and only
    the closest HALF of classes (rank*2 <= n_classes, ties to the lower
    nationkey) release their rows — a rank budget rather than a fixed
    threshold, because an absolute t cut-off that splits one SF
    suppresses everything (or nothing) at another; rank semantics hold
    at every corpus size.  Each released row carries its class's t so
    the downstream consumer can audit the bound actually achieved.

    Scale: the metric is two small aggregates + a segments-sized
    broadcast (i20's shape); ranking is a window over O(classes) rows;
    the release join broadcasts the class verdicts back onto the
    corpus — one map-side filter, no second corpus shuffle."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    t = A.t_closeness_metric(c, ["c_nationkey"], "c_mktsegment")
    w = Window.orderBy("t_closeness", "c_nationkey")
    ranked = (
        t.withColumn("rn", F.row_number().over(w))
        .withColumn("n_classes", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.col("rn") * 2 <= F.col("n_classes"))
        .select("c_nationkey", "t_closeness")
    )
    return c.join(F.broadcast(ranked), "c_nationkey").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "t_closeness"
    )


def _i44_oracle() -> str:
    from ma_anonymization_etl_spark.operators.dp import _sql_uniform

    u = _sql_uniform("c_custkey", "dpres|")
    return f"""
WITH s AS (SELECT c_mktsegment, c_nationkey, ({u}) < 0.4 AS in_sample
           FROM customer),
cls AS (SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_pop,
               CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sample
        FROM s GROUP BY c_mktsegment, c_nationkey)
SELECT c_mktsegment, c_nationkey, n_pop, n_sample,
       ROUND(n_sample::DOUBLE / n_pop, 6) AS delta,
       (n_sample::DOUBLE / n_pop < 0.2 OR n_sample::DOUBLE / n_pop > 0.6)
         AS violates
FROM cls
"""


@register("i44_delta_presence", oracle=_i44_oracle())
def i44_delta_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i44 (extension): δ-presence (Nergiz/Atzori/Clifton, SIGMOD'07)
    — the SDC disclosure measure the k/l/t family misses: given the
    public customer population and a released subset (here a salted
    md5-deterministic 40% sample, so both engines replay membership
    exactly), per-(segment, nation) class δ = |sample ∩ class|/|class|
    is the adversary's presence-inference probability; classes outside
    the (0.2, 0.6) band are flagged — too high pins presence, too low
    provably pins ABSENCE.  Completes the disclosure-metric family
    i16/i19/i20/i21/i34.  Delegates to ``A.delta_presence``."""
    from ma_anonymization_etl_spark.operators.dp import hash_uniform

    c = load(spark, sf_dir, "customer").withColumn(
        "in_sample", hash_uniform(F.col("c_custkey"), "dpres|") < 0.4
    )
    return A.delta_presence(
        c, ["c_mktsegment", "c_nationkey"], "in_sample", dmin=0.2, dmax=0.6
    )


@register(
    "i45_recursive_cl_diversity",
    oracle="""
WITH freq AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
ranked AS (
  SELECT c_nationkey, n,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY n DESC, c_mktsegment) AS rk
  FROM freq
)
SELECT c_nationkey,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS m_distinct,
       CAST(MAX(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS r1,
       CAST(COALESCE(SUM(CASE WHEN rk >= 2 THEN n END), 0) AS BIGINT)
         AS tail_sum,
       (MAX(CASE WHEN rk = 1 THEN n END)
          < 2.0 * COALESCE(SUM(CASE WHEN rk >= 2 THEN n END), 0)) AS diverse
FROM ranked GROUP BY c_nationkey
""",
)
def i45_recursive_cl_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i45 (extension): recursive (c,l)-diversity (Machanavajjhala et
    al., TKDD'07 §4.2) with c=2, l=2 on the i36 class/SA shape
    (nation classes, market-segment SA) — completes the l-diversity
    family: i19 counts distinct SA values, i36 gates on entropy, this
    gates on the DOMINANCE of the most common value after discarding
    the l−1 runners-up.  Delegates to ``A.recursive_cl_diversity``."""
    cust = load(spark, sf_dir, "customer")
    return A.recursive_cl_diversity(
        cust, ["c_nationkey"], "c_mktsegment", c=2.0, l=2
    )
