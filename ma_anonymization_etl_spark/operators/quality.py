"""Data-quality operators (group Q): table profiling and declarative
constraint checking — the Deequ/Great-Expectations-shaped surface an
ETL runs before and after every anonymization route (you cannot prove
a release safe, or a pipeline non-destructive, without knowing null
rates, cardinalities, and referential integrity on both sides).

Scale: profiling is ONE pass over the table — every per-column metric
is an aggregate expression in a single groupBy-less agg (Spark fuses
them into one partial+final aggregate), then the wide 1-row result is
unpivoted to the report shape driver-side via ``stack`` (no second
scan).  Exact distinct counts are the honest default at test SF; the
100 TB variant swaps ``countDistinct`` for ``approx_count_distinct``
per column in the same single pass (the d4 pattern).  Constraint
checks are each one aggregate or one anti-join on the keys involved —
referential checks shuffle only the key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

def profile_table(df: DataFrame, numeric: list[str], strings: list[str]) -> DataFrame:
    """One-pass column profiler: null counts, exact distinct counts,
    numeric min/max, string average length — one row per column."""
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in numeric + strings:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nd_{c}"))
    for c in numeric:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
    for c in strings:
        aggs.append(F.round(F.avg(F.length(c)), 4).alias(f"__len_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in numeric:
        rows.append(
            f"'{c}', __n, __null_{c}, __nd_{c}, __min_{c}, __max_{c}, "
            f"cast(null as double)"
        )
    for c in strings:
        rows.append(
            f"'{c}', __n, __null_{c}, __nd_{c}, cast(null as double), "
            f"cast(null as double), __len_{c}"
        )
    n = len(rows)
    return wide.select(
        F.expr(
            f"stack({n}, {', '.join(rows)}) AS "
            "(col_name, n_rows, n_null, n_distinct, min_num, max_num, avg_len)"
        )
    )


@register(
    "q1_data_profile",
    oracle="""
WITH w AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS null_ck,
         COUNT(DISTINCT c_custkey) AS nd_ck,
         MIN(c_custkey)::DOUBLE AS min_ck, MAX(c_custkey)::DOUBLE AS max_ck,
         SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS null_nk,
         COUNT(DISTINCT c_nationkey) AS nd_nk,
         MIN(c_nationkey)::DOUBLE AS min_nk, MAX(c_nationkey)::DOUBLE AS max_nk,
         SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS null_ab,
         COUNT(DISTINCT c_acctbal) AS nd_ab,
         MIN(c_acctbal) AS min_ab, MAX(c_acctbal) AS max_ab,
         SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS null_nm,
         COUNT(DISTINCT c_name) AS nd_nm,
         ROUND(AVG(length(c_name)), 4) AS len_nm,
         SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS null_ms,
         COUNT(DISTINCT c_mktsegment) AS nd_ms,
         ROUND(AVG(length(c_mktsegment)), 4) AS len_ms
  FROM customer
)
SELECT 'c_custkey' AS col_name, n AS n_rows, CAST(null_ck AS BIGINT) AS n_null,
       nd_ck AS n_distinct, min_ck AS min_num, max_ck AS max_num,
       NULL::DOUBLE AS avg_len FROM w
UNION ALL
SELECT 'c_nationkey', n, CAST(null_nk AS BIGINT), nd_nk, min_nk, max_nk,
       NULL::DOUBLE FROM w
UNION ALL
SELECT 'c_acctbal', n, CAST(null_ab AS BIGINT), nd_ab, min_ab, max_ab,
       NULL::DOUBLE FROM w
UNION ALL
SELECT 'c_name', n, CAST(null_nm AS BIGINT), nd_nm, NULL::DOUBLE, NULL::DOUBLE,
       len_nm FROM w
UNION ALL
SELECT 'c_mktsegment', n, CAST(null_ms AS BIGINT), nd_ms, NULL::DOUBLE,
       NULL::DOUBLE, len_ms FROM w
""",
)
def q1_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q1: one-pass table profiler over customer — per column: row/null
    counts, exact distinct count, numeric min/max, string avg length.
    The classification step (i1) consumes exactly these statistics to
    propose DI/QI/SA tags; the profiler is also the before/after
    evidence that an anonymization route preserved shapes it promised
    to preserve."""
    c = load(spark, sf_dir, "customer")
    return profile_table(
        c, numeric=["c_custkey", "c_nationkey", "c_acctbal"],
        strings=["c_name", "c_mktsegment"],
    )


def run_constraint_checks(checks) -> DataFrame:
    """Parameterized constraint engine behind q2: each check is a dict —

    - ``{"name", "type": "unique", "df", "col"}`` — duplicate count;
    - ``{"name", "type": "fk", "child", "child_key", "parent",
      "parent_key"}`` — orphan count via a key-only anti-join;
    - ``{"name", "type": "violation", "df", "predicate"}`` — rows where
      the (Column) predicate is TRUE.

    Returns one ``(check_name, n_violations)`` row per check, unioned
    in input order; 0 everywhere = the suite passed.  Each check is a
    single aggregate (anti-join + count for FKs) — the same plan the
    inline version built."""
    parts = []
    for ck in checks:
        kind = ck["type"]
        if kind == "unique":
            parts.append(
                ck["df"].agg(
                    F.lit(ck["name"]).alias("check_name"),
                    (F.count(F.lit(1)) - F.countDistinct(ck["col"])).alias(
                        "n_violations"
                    ),
                )
            )
        elif kind == "fk":
            parts.append(
                ck["child"]
                .join(
                    ck["parent"],
                    ck["child"][ck["child_key"]] == ck["parent"][ck["parent_key"]],
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(ck["name"]).alias("check_name"), "n_violations")
            )
        elif kind == "violation":
            parts.append(
                ck["df"].agg(
                    F.lit(ck["name"]).alias("check_name"),
                    F.sum(ck["predicate"].cast("long")).alias("n_violations"),
                )
            )
        else:
            raise ValueError(f"unknown check type: {kind!r}")
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


@register(
    "q2_constraint_check",
    oracle="""
SELECT 'orderkey_unique' AS check_name,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'orders_custkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem_orderkey_fk',
       CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'totalprice_positive',
       CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orderstatus_domain',
       CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
            AS BIGINT)
FROM orders
UNION ALL
SELECT 'custname_complete',
       CAST(SUM(CASE WHEN c_name IS NULL OR c_name = '' THEN 1 ELSE 0 END)
            AS BIGINT)
FROM customer
""",
)
def q2_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2: declarative constraint suite — uniqueness, two referential
    (FK) checks, a range check, a domain check, and a completeness
    check, each reported as a violation count (0 = passed).  The FK
    checks are key-only anti-joins; everything else folds into single
    aggregates.  This is the gate an ETL runs post-write: a route that
    broke referential integrity (e.g. pseudonymized one side of a key
    but not the other) fails HERE, loudly, not downstream.

    Delegates to ``run_constraint_checks`` — the parameterized library
    entry point a user points at their own tables and rules."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    return run_constraint_checks(
        [
            {"name": "orderkey_unique", "type": "unique", "df": o, "col": "o_orderkey"},
            {"name": "orders_custkey_fk", "type": "fk", "child": o,
             "child_key": "o_custkey", "parent": c, "parent_key": "c_custkey"},
            {"name": "lineitem_orderkey_fk", "type": "fk", "child": li,
             "child_key": "l_orderkey", "parent": o.select("o_orderkey"),
             "parent_key": "o_orderkey"},
            {"name": "totalprice_positive", "type": "violation", "df": o,
             "predicate": F.col("o_totalprice") <= 0},
            {"name": "orderstatus_domain", "type": "violation", "df": o,
             "predicate": ~F.col("o_orderstatus").isin("O", "F", "P")},
            {"name": "custname_complete", "type": "violation", "df": c,
             "predicate": F.col("c_name").isNull() | (F.col("c_name") == "")},
        ]
    )


@register(
    "q3_outlier_zscore",
    oracle="""
WITH s AS (
  SELECT c_nationkey, COUNT(*) AS n,
         SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS sc,
         SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)
             * CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS sq
  FROM customer GROUP BY 1
), st AS (
  SELECT c_nationkey, n,
         (sc::DOUBLE / 100) / n AS mu,
         CASE WHEN n < 2 THEN 0.0
              ELSE sqrt((sq::DOUBLE / 10000 - n * ((sc::DOUBLE / 100) / n)
                         * ((sc::DOUBLE / 100) / n)) / (n - 1)) END AS sd
  FROM s
)
SELECT c.c_nationkey, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(MAX(mu), 4) AS mean_bal, ROUND(MAX(sd), 4) AS std_bal,
       CAST(SUM(CASE WHEN ABS(FLOOR(c_acctbal * 100) / 100.0 - mu) > 2.5 * sd
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM customer c JOIN st USING (c_nationkey)
GROUP BY 1
""",
)
def q3_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3: per-group z-score outlier screen (|x − μ| > 2.5σ per
    nation) — the anomaly gate that runs next to q2's hard constraints,
    and the pre-filter an anonymization route consults before
    top/bottom-coding (i12).  μ and σ derive from EXACT integer sums
    (int64 first moment, decimal(38) second moment — wrap-proof at any
    group size), so both engines build identical doubles and the
    boundary comparison cannot flip on float-summation order — the
    dsum discipline applied to second moments.  Singleton groups
    release σ = 0 / zero outliers by definition (guarded in both
    engines).

    Scale: one grouped aggregate for the moments (broadcast back) + one
    flagging pass — two scans, no sort; the moment sums merge
    associatively, so the stats table can be maintained incrementally
    (n3 pattern).

    Delegates to ``group_zscore_outliers`` — point it at any
    (group, value) pair with your own z threshold."""
    c = load(spark, sf_dir, "customer")
    return group_zscore_outliers(c, "c_nationkey", "c_acctbal", z=2.5).select(
        "c_nationkey",
        "n",
        F.col("mean_value").alias("mean_bal"),
        F.col("std_value").alias("std_bal"),
        "n_outliers",
    )


def group_zscore_outliers(
    df: DataFrame, group_col: str, value_col: str, z: float = 2.5
) -> DataFrame:
    """q3's engine, parameterized: per-group exact-integer moments
    (cents-scaled int64 first moment, decimal(38) second moment --
    wrap-proof at any group size), broadcast back, |x - mu| > z*sigma
    flagged in one pass.  Returns (group_col, n, mean_value,
    std_value, n_outliers); singleton groups release sigma = 0 and
    zero outliers."""
    cents = F.floor(F.col(value_col) * 100).cast("long")
    # Sum-of-squares accumulates in DECIMAL(38,0): per-row cents^2 fits
    # int64 but a >=~9M-row group's SUM would wrap silently in Spark's
    # non-ANSI long sum (DuckDB promotes to HUGEINT); both widen to the
    # same double at the end.
    s = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sc"),
        F.sum((cents * cents).cast("decimal(38,0)")).alias("sq"),
    )
    mu = (F.col("sc").cast("double") / 100) / F.col("n")
    sd = F.when(F.col("n") < 2, F.lit(0.0)).otherwise(
        F.sqrt(
            (F.col("sq").cast("double") / 10000 - F.col("n") * mu * mu)
            / (F.col("n") - 1)
        )
    )
    st = s.select(group_col, "n", mu.alias("mu"), sd.alias("sd"))
    x = F.floor(F.col(value_col) * 100) / 100.0
    return (
        df.join(F.broadcast(st), group_col)
        .groupBy(group_col)
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(F.max("mu"), 4).alias("mean_value"),
            F.round(F.max("sd"), 4).alias("std_value"),
            F.sum(
                (F.abs(x - F.col("mu")) > F.lit(float(z)) * F.col("sd")).cast("int")
            ).cast("long").alias("n_outliers"),
        )
    )


@register(
    "q4_embedding_quality",
    oracle="""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
)
SELECT COUNT(*) AS n_vecs,
       CAST(SUM(CASE WHEN len(e) <> 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_dim,
       CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
       CAST(SUM(CASE WHEN isnan(nrm) THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
       ROUND(MIN(nrm), 5) AS min_norm,
       ROUND(MAX(nrm), 5) AS max_norm,
       ROUND((CAST(SUM(CASE WHEN isnan(nrm) THEN 0
                            ELSE CAST(FLOOR(nrm * 1000000) AS BIGINT) END)
                   AS DOUBLE) / 1000000)
             / COUNT(*), 5) AS avg_norm
FROM v
""",
)
def q4_embedding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4: embedding-table quality audit — the vector-side q1: dimension
    conformance, zero/NaN norms (both break every cosine operator
    downstream, j8-j33), and the norm distribution summary.  The
    average norm accumulates in scaled int64 (dsum discipline) so the
    report is engine-exact, and NaN norms contribute 0 to the average
    (they are counted in n_nan — without the guard Spark's (long)NaN→0
    silently corrupts while DuckDB's CAST raises); min/max are
    order-free.

    Scale: one map-side fold per vector + one global aggregate — a
    single pass, no shuffle beyond the 1-row final merge.  Run this
    gate before building any index; a handful of zero vectors poison
    IVF centroids (j20) silently otherwise.

    Delegates to ``embedding_quality_report`` — point it at any
    array<float/double> column with your expected dimension."""
    e = load(spark, sf_dir, "embeddings")
    return embedding_quality_report(e, vec_col="embedding", dims=64)


def embedding_quality_report(
    df: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """q4's engine, parameterized: one-pass vector-table audit —
    dimension conformance against ``dims``, zero/NaN norm counts, and
    the norm distribution (min/max order-free, average in scaled int64
    so the report is engine-exact; NaN norms contribute 0 to the
    average and are counted in n_nan)."""
    from ma_anonymization_etl_spark.functions.vectors import as_double, norm

    v = df.select(as_double(F.col(vec_col)).alias("e")).withColumn(
        "nrm", norm(F.col("e"))
    )
    return v.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.size("e") != dims).cast("int")).cast("long").alias("n_bad_dim"),
        F.sum((F.col("nrm") == 0).cast("int")).cast("long").alias("n_zero_norm"),
        F.sum(F.isnan("nrm").cast("int")).cast("long").alias("n_nan"),
        F.round(F.min("nrm"), 5).alias("min_norm"),
        F.round(F.max("nrm"), 5).alias("max_norm"),
        F.round(
            (
                F.sum(
                    F.when(F.isnan("nrm"), F.lit(0).cast("long")).otherwise(
                        F.floor(F.col("nrm") * 1000000).cast("long")
                    )
                ).cast("double")
                / 1000000
            )
            / F.count(F.lit(1)),
            5,
        ).alias("avg_norm"),
    )


@register(
    "q5_drift_psi",
    # Population Stability Index between the stream's first and second
    # half-month, per event_type, over 10 fixed value bins (width 50,
    # top-coded at bin 9) with +1 Laplace smoothing so empty bins stay
    # finite.  All densities are IEEE doubles built with one fixed op
    # order; the 10-term PSI sum rounds to 6 dp (the established
    # float-accumulation discipline).
    oracle="""
WITH e AS (
  SELECT event_type,
         LEAST(9, CAST(FLOOR(value / 50) AS BIGINT)) AS bin,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS half
  FROM events
),
frame AS (
  SELECT g.event_type, b.bin, h.half
  FROM (SELECT DISTINCT event_type FROM e) g,
       (SELECT unnest(range(10)) AS bin) b,
       (VALUES (0), (1)) h(half)
),
cnt AS (SELECT event_type, bin, half, COUNT(*) AS n FROM e GROUP BY 1, 2, 3),
f AS (
  SELECT fr.event_type, fr.bin, fr.half, COALESCE(c.n, 0) AS n
  FROM frame fr LEFT JOIN cnt c
    ON c.event_type = fr.event_type AND c.bin = fr.bin AND c.half = fr.half
),
tot AS (SELECT event_type, half, SUM(n) AS nh FROM f GROUP BY 1, 2),
p AS (
  SELECT f.event_type, f.bin, f.half,
         (CAST(f.n AS DOUBLE) + 1) / (CAST(t.nh AS DOUBLE) + 10) AS p
  FROM f JOIN tot t ON t.event_type = f.event_type AND t.half = f.half
),
w AS (
  SELECT b.event_type, b.bin, b.p AS p0, c.p AS p1
  FROM p b JOIN p c ON c.event_type = b.event_type AND c.bin = b.bin
  WHERE b.half = 0 AND c.half = 1
),
psi AS (
  SELECT event_type, ROUND(SUM((p1 - p0) * LN(p1 / p0)), 6) AS psi
  FROM w GROUP BY event_type
)
SELECT s.event_type,
       CAST(t0.nh AS BIGINT) AS n_base,
       CAST(t1.nh AS BIGINT) AS n_current,
       s.psi,
       s.psi > 0.1 AS drifted
FROM psi s
JOIN tot t0 ON t0.event_type = s.event_type AND t0.half = 0
JOIN tot t1 ON t1.event_type = s.event_type AND t1.half = 1
""",
)
def q5_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q5: DISTRIBUTION DRIFT detection via the Population Stability
    Index — the standard production-ML monitor for "has this feature's
    distribution moved since the baseline window": per event_type, the
    value distribution of the first half-month (baseline) vs the second
    (current) over 10 fixed-width bins, PSI = Σ (p_cur − p_base) ·
    ln(p_cur / p_base) with +1 smoothing; PSI > 0.1 is the conventional
    investigate threshold, > 0.25 act.  A q1/q2-style release: the
    audit table a pipeline publishes per monitoring window.

    Scale: one scan → one (type, half, bin)-keyed partial aggregate
    (≤ types×2×10 groups); the bin frame is built from the distinct
    types (broadcast) so empty bins participate in smoothing; all
    downstream algebra runs on the tiny count table.  At 100 TB the
    same plan holds — drift monitoring is aggregate-sized, not
    corpus-sized.

    Delegates to ``psi_drift`` — hand it any (key, bin, half)
    assignment built from your own feature and window split."""
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("key"),
        F.least(F.lit(9), F.floor(F.col("value") / 50)).cast("long").alias("bin"),
        F.when(F.col("ts") < "2024-01-16", 0).otherwise(1).alias("half"),
    )
    return psi_drift(e, n_bins=10, threshold=0.1).select(
        F.col("key").alias("event_type"), "n_base", "n_current", "psi", "drifted"
    )


def psi_drift(
    binned: DataFrame, n_bins: int = 10, threshold: float = 0.1
) -> DataFrame:
    """q5's engine, parameterized: Population Stability Index between
    half 0 (baseline) and half 1 (current) per key, over a ``binned``
    DataFrame of (key, bin, half) rows with bin in [0, n_bins) —
    +1 Laplace smoothing over the full bin frame so empty bins stay
    finite.  Returns (key, n_base, n_current, psi, drifted)."""
    spark = binned.sparkSession
    # The ≤ keys×2×n_bins-row count table feeds MANY consumers (frame, f,
    # tot, both halves of p, the final count joins); without
    # materialization each consumer re-derives it from a full corpus
    # scan (measured: 12 scans).  Checkpointing the tiny table makes the
    # corpus scan happen exactly once — the j38/cells discipline.
    cnt = (
        binned.groupBy("key", "bin", "half")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    frame = (
        cnt.select("key")
        .distinct()
        .crossJoin(spark.range(n_bins).select(F.col("id").alias("bin")))
        .crossJoin(spark.range(2).select(F.col("id").alias("half")))
    )
    f = frame.join(cnt, ["key", "bin", "half"], "left").select(
        "key", "bin", "half", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    tot = f.groupBy("key", "half").agg(F.sum("n").alias("nh"))
    p = f.join(tot, ["key", "half"]).select(
        "key",
        "bin",
        "half",
        (
            (F.col("n").cast("double") + 1)
            / (F.col("nh").cast("double") + F.lit(float(n_bins)))
        ).alias("p"),
    )
    b = p.filter(F.col("half") == 0).select("key", "bin", F.col("p").alias("p0"))
    c = p.filter(F.col("half") == 1).select("key", "bin", F.col("p").alias("p1"))
    psi = (
        b.join(c, ["key", "bin"])
        .groupBy("key")
        .agg(
            F.round(
                F.sum((F.col("p1") - F.col("p0")) * F.log(F.col("p1") / F.col("p0"))),
                6,
            ).alias("psi")
        )
    )
    t0 = tot.filter(F.col("half") == 0).select(
        "key", F.col("nh").cast("long").alias("n_base")
    )
    t1 = tot.filter(F.col("half") == 1).select(
        "key", F.col("nh").cast("long").alias("n_current")
    )
    return (
        psi.join(t0, "key")
        .join(t1, "key")
        .select(
            "key",
            "n_base",
            "n_current",
            "psi",
            (F.col("psi") > F.lit(float(threshold))).alias("drifted"),
        )
    )


@register(
    "q6_fd_profile",
    oracle="""
SELECT 'events: user_id -> event_type' AS fd,
       COUNT(*) AS n_lhs,
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
       MAX(k) AS max_rhs_per_lhs
FROM (SELECT user_id, COUNT(DISTINCT event_type) AS k FROM events GROUP BY user_id)
UNION ALL
SELECT 'documents: source -> lang',
       COUNT(*),
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
       MAX(k)
FROM (SELECT source, COUNT(DISTINCT lang) AS k FROM documents GROUP BY source)
UNION ALL
SELECT 'orders: o_custkey -> o_orderpriority',
       COUNT(*),
       CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT),
       MAX(k)
FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS k
      FROM orders GROUP BY o_custkey)
""",
)
def q6_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q6: functional-dependency PROFILING — for each candidate FD
    A -> B, how many A-values map to more than one B (0 violating
    left-hand sides = the FD holds and B is derivable/suppressible
    from A; a large count = the dependency is spurious).  The
    anonymization use is direct: a quasi-identifier that functionally
    determines a sensitive column is a disclosure channel (i1/i39's
    classification needs exactly this evidence), and dedup keys are
    only safe survivor-pickers when key -> payload actually holds.

    Scale: each FD is one two-level aggregate — distinct-count per
    LHS then a tiny rollup; shuffles carry (lhs, rhs) pairs only.
    Candidate generation at 100 TB samples first (profile on j18's
    hash sample, confirm on the full table).

    Delegates to ``fd_violation_profile`` per candidate dependency."""
    e = load(spark, sf_dir, "events")
    d = load(spark, sf_dir, "documents")
    o = load(spark, sf_dir, "orders")
    return (
        fd_violation_profile(
            e, "user_id", "event_type", name="events: user_id -> event_type"
        )
        .unionByName(
            fd_violation_profile(d, "source", "lang", name="documents: source -> lang")
        )
        .unionByName(
            fd_violation_profile(
                o, "o_custkey", "o_orderpriority",
                name="orders: o_custkey -> o_orderpriority",
            )
        )
    )


def fd_violation_profile(
    df: DataFrame, lhs: str, rhs: str, name: str | None = None
) -> DataFrame:
    """q6's engine, parameterized: profile one candidate functional
    dependency lhs -> rhs — how many lhs values map to >1 rhs (0 = the
    FD holds).  Returns one (fd, n_lhs, n_violating_lhs,
    max_rhs_per_lhs) row; union several for a suite."""
    per = df.groupBy(lhs).agg(F.countDistinct(rhs).alias("k"))
    return per.agg(
        F.lit(name or f"{lhs} -> {rhs}").alias("fd"),
        F.count(F.lit(1)).alias("n_lhs"),
        F.sum((F.col("k") > 1).cast("long")).alias("n_violating_lhs"),
        F.max("k").alias("max_rhs_per_lhs"),
    )


def volume_anomaly_flags(
    daily: DataFrame, window_days: int = 7, sigma: int = 3
) -> DataFrame:
    """q7's integer sigma rule over a (day, n) series — shared with
    the spike-injection test so the test exercises the SHIPPED rule,
    not a copy: |n - mean| > sigma*sd over the trailing self-exclusive
    ``window_days`` window rewritten as
    (n*k - S)^2 * (k-1) > sigma^2 * k * (k*Q - S^2) — exact in int64
    for integer sigma."""
    from pyspark.sql import Window

    win = Window.orderBy("day").rowsBetween(-window_days, -1)
    w = (
        daily.withColumn("k", F.count("n").over(win))
        .withColumn("s", F.sum("n").over(win))
        .withColumn("q", F.sum(F.col("n") * F.col("n")).over(win))
    )
    dev2 = (F.col("n") * F.col("k") - F.col("s")) * (
        F.col("n") * F.col("k") - F.col("s")
    )
    var_k = F.col("k") * F.col("q") - F.col("s") * F.col("s")
    return w.select(
        "day",
        "n",
        F.col("k").cast("long").alias("k_window"),
        (
            (F.col("k") >= 2)
            & (dev2 * (F.col("k") - 1) > F.lit(sigma * sigma) * F.col("k") * var_k)
        ).alias("is_anomaly"),
    )


@register(
    "q7_volume_anomaly",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
w AS (
  SELECT day, n,
         COUNT(n) OVER win AS k,
         SUM(n) OVER win AS s,
         SUM(n * n) OVER win AS q
  FROM daily
  WINDOW win AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, n, CAST(k AS BIGINT) AS k_window,
       (k >= 2 AND
        (n * k - s) * (n * k - s) * (k - 1) > 9 * k * (k * q - s * s))
         AS is_anomaly
FROM w
""",
)
def q7_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q7: ingest-volume anomaly detection — each day's event count is
    tested against the trailing 7-day baseline (window EXCLUDES the
    current day, so a spike cannot inflate its own baseline) with a
    3-sigma rule evaluated ENTIRELY in integer arithmetic:
    |n - mean| > 3*sd  <=>  (n*k - S)^2 * (k-1) > 9*k*(k*Q - S^2)
    over the window's count/sum/sum-of-squares — no float mean, no
    stddev accumulation-order drift, bit-identical across engines.
    (Magnitudes here keep every product inside int64; beyond ~1e6
    events/day route the squares through DECIMAL.)  Days with fewer
    than 2 baseline days report is_anomaly = false.

    Scale: the daily rollup is one aggregate (partial-merged
    map-side); the window runs over O(days) rows — trivially small
    forever.  This is the volume-freshness gate a pipeline runs before
    trusting a day's partition (pairs with k23's lateness audit)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return volume_anomaly_flags(daily)


def ewma_anomaly_flags(daily: DataFrame, num: int = 1, den: int = 2) -> DataFrame:
    """q8's engine: EWMA-baseline anomaly rule over a (day, n) series,
    exact in int64 (NEXT.md r6 item j — q7's integer trick generalized
    to a geometric-weight rolling rule).

    The trailing-7-day EWMA with rational decay num/den (default 1/2)
    assigns day t-i weight (num/den)^(i-1); clearing denominators, the
    baseline comparison  |n - ewma| > ewma/2  becomes

        2 * |n * D - S| > S,   S = sum_i n_{t-i} * num^(i-1) * den^(7-i),
                               D = sum_{present i} num^(i-1) * den^(7-i)

    — every term an int64 product of a day count (< ~1e6 at any sane
    partition grain) and a weight <= den^6, so the rule is bit-exact
    and engine-identical with no float accumulation anywhere.  Days
    with fewer than 2 baseline days report is_anomaly = false.

    "Trailing 7 days" means CALENDAR days, not the 7 previous observed
    rows (round-7 review: a row-offset F.lag silently turned gaps in
    the series into wrong baselines).  Each day's baseline therefore
    comes from a DATE-KEYED join: every observed day ships its count
    forward to day+i with weight w_i, one union + groupBy(day) + left
    join — absent calendar days simply contribute nothing, exactly the
    missing-lag semantics the weights D/k already handle."""
    arms = []
    for i in range(1, 8):
        wt = num ** (i - 1) * den ** (7 - i)
        arms.append(
            daily.select(
                (F.col("day") + F.expr(f"INTERVAL {i} DAY")).alias("day"),
                (F.col("n") * F.lit(wt)).cast("long").alias("_s"),
                F.lit(wt).cast("long").alias("_d"),
            )
        )
    base = arms[0]
    for a in arms[1:]:
        base = base.unionByName(a)
    agg = base.groupBy("day").agg(
        F.sum("_s").alias("_num"),
        F.sum("_d").alias("_den"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = daily.join(agg, "day", "left").select(
        "day",
        "n",
        F.coalesce(F.col("_k"), F.lit(0)).cast("long").alias("k_window"),
        F.coalesce(F.col("_num"), F.lit(0)).cast("long").alias("ewma_num"),
        F.coalesce(F.col("_den"), F.lit(0)).cast("long").alias("ewma_den"),
    )
    dev = F.col("n") * F.col("ewma_den") - F.col("ewma_num")
    return j.select(
        "day",
        "n",
        "k_window",
        "ewma_num",
        "ewma_den",
        (
            (F.col("k_window") >= 2) & (F.lit(2) * F.abs(dev) > F.col("ewma_num"))
        ).alias("is_anomaly"),
    )


def _q8_baseline_sql() -> str:
    """Date-keyed baseline arms (mirrors the engine's union: every day
    ships its count to day+i with weight num^(i-1)·den^(7-i))."""
    arms = []
    for i in range(1, 8):
        wt = 1 ** (i - 1) * 2 ** (7 - i)
        arms.append(
            f"SELECT day + INTERVAL {i} DAY AS day, n * {wt} AS s_term, "
            f"{wt} AS d_term FROM daily"
        )
    return " UNION ALL ".join(arms)


@register(
    "q8_ewma_anomaly",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
b AS ({_q8_baseline_sql()}),
agg AS (
  SELECT day, SUM(s_term) AS ewma_num, SUM(d_term) AS ewma_den,
         COUNT(*) AS k_window
  FROM b GROUP BY day
),
w AS (
  SELECT d.day, d.n,
         COALESCE(ewma_num, 0) AS ewma_num,
         COALESCE(ewma_den, 0) AS ewma_den,
         COALESCE(k_window, 0) AS k_window
  FROM daily d LEFT JOIN agg USING (day)
)
SELECT day, n, CAST(k_window AS BIGINT) AS k_window,
       CAST(ewma_num AS BIGINT) AS ewma_num,
       CAST(ewma_den AS BIGINT) AS ewma_den,
       (k_window >= 2 AND 2 * ABS(n * ewma_den - ewma_num) > ewma_num)
         AS is_anomaly
FROM w
""",
)
def q8_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8 (extension): EWMA-baseline volume anomaly — q7's sibling with
    a geometrically-decaying baseline (recent days dominate) instead of
    the flat 7-day mean: flags a day whose count deviates from the
    1/2-decay EWMA of the trailing week by more than 50%.  All
    arithmetic is exact int64 (weights are powers of 2; denominators
    cleared), so the flag decision cannot flip on float accumulation
    order — see ``ewma_anomaly_flags`` for the algebra.

    Scale: identical profile to q7 — one partial-merged daily rollup,
    then a single window pass over O(days) rows, trivially small at
    any corpus size.  Delegates to ``ewma_anomaly_flags``."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return ewma_anomaly_flags(daily, num=1, den=2)


def mad_outlier_report(
    df: DataFrame,
    group_col: str,
    val_col: str,
    c: float = 4.4478,
) -> DataFrame:
    """q9's engine: ROBUST outlier detection via median/MAD (Hampel
    identifier) — q3's z-score breaks down when outliers inflate the
    mean and stddev they are judged against (masking); median and MAD
    have a 50% breakdown point.  Flags |x - med| > c · MAD with
    c = 3 · 1.4826 (the normal-consistency constant), written as the
    single literal 4.4478 so both engines fold the same double.

    med and MAD are exact interpolating percentiles ROUNDed to 4dp
    before the comparison — both engines then evaluate the identical
    IEEE expression, so the flag cannot flip on a last-ulp percentile
    difference.  Two grouped-percentile passes + two broadcast
    join-backs (group cardinality is small); the row stream is scanned
    twice, shuffled never.

    Returns per-group (n_rows, med, mad, n_outliers)."""
    med = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({val_col}, 0.5)"), 4).alias("med")
    )
    j = df.join(F.broadcast(med), group_col)
    mad = j.groupBy(group_col).agg(
        F.round(F.expr(f"percentile(abs({val_col} - med), 0.5)"), 4).alias("mad")
    )
    full = j.join(F.broadcast(mad), group_col)
    flag = F.abs(F.col(val_col) - F.col("med")) > F.lit(c) * F.col("mad")
    return full.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.sum(flag.cast("long")).alias("n_outliers"),
    )


@register(
    "q9_mad_outliers",
    oracle="""
WITH med AS (SELECT c_mktsegment, ROUND(quantile_cont(c_acctbal, 0.5), 4) AS med
             FROM customer GROUP BY 1),
j AS (SELECT c.c_mktsegment, c_acctbal, med
      FROM customer c JOIN med USING (c_mktsegment)),
mad AS (SELECT c_mktsegment,
               ROUND(quantile_cont(ABS(c_acctbal - med), 0.5), 4) AS mad
        FROM j GROUP BY 1)
SELECT j.c_mktsegment,
       COUNT(*) AS n_rows,
       MIN(j.med) AS med,
       MIN(mad.mad) AS mad,
       SUM(CASE WHEN ABS(c_acctbal - j.med) > 4.4478 * mad.mad
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM j JOIN mad USING (c_mktsegment)
GROUP BY 1
""",
)
def q9_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9 (extension): robust per-segment account-balance outlier
    report via the Hampel identifier (median/MAD, c = 3·1.4826) — the
    robust sibling of q3's z-score rule.  On this corpus's uniform
    balances n_outliers is legitimately 0 (max |x-med| ≈ 2·MAD <
    4.4478·MAD — the rule is calibrated for heavy tails, and the
    property test injects a spike to prove it fires); med and mad are
    the value-checked payload.

    Delegates to ``mad_outlier_report``."""
    c = load(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    return mad_outlier_report(c, "c_mktsegment", "c_acctbal")


def seasonal_anomaly_flags(
    daily: DataFrame, period: int = 7, n_periods: int = 4
) -> DataFrame:
    """q10's engine: SEASONAL-NAIVE anomaly rule — each day is compared
    to the mean of the same weekday over the trailing ``n_periods``
    weeks (lags period, 2·period, …), so weekly seasonality never
    masks or fakes an anomaly the way q7's mixed-weekday trailing mean
    can.  Exact in int64: with S = Σ present lag counts and k = #
    present lags, the rule |n − S/k| > (S/k)/2 clears denominators to
    2·|n·k − S| > S.  Days with fewer than 2 same-weekday baselines
    report is_anomaly = false.

    "Same weekday, trailing ``n_periods`` weeks" is a CALENDAR claim,
    so the baseline is DATE-KEYED (round-7 review: a row-offset
    F.lag(n, i·period) on a gappy series silently compared against
    whatever happened to sit i·period ROWS back — a wrong weekday).
    Every observed day ships its count forward to day + i·period; one
    union + groupBy(day) + left join, O(days) rows throughout — same
    profile as q7/q8."""
    arms = [
        daily.select(
            (F.col("day") + F.expr(f"INTERVAL {i * period} DAY")).alias("day"),
            F.col("n").cast("long").alias("_s"),
        )
        for i in range(1, n_periods + 1)
    ]
    base = arms[0]
    for a in arms[1:]:
        base = base.unionByName(a)
    agg = base.groupBy("day").agg(
        F.sum("_s").alias("_sum"), F.count(F.lit(1)).alias("_k")
    )
    j = daily.join(agg, "day", "left").select(
        "day",
        "n",
        F.coalesce(F.col("_k"), F.lit(0)).cast("long").alias("k_window"),
        F.coalesce(F.col("_sum"), F.lit(0)).cast("long").alias("season_sum"),
    )
    dev = F.col("n") * F.col("k_window") - F.col("season_sum")
    return j.select(
        "day",
        "n",
        "k_window",
        "season_sum",
        (
            (F.col("k_window") >= 2) & (F.lit(2) * F.abs(dev) > F.col("season_sum"))
        ).alias("is_anomaly"),
    )


@register(
    "q10_seasonal_anomaly",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
b AS (
  SELECT day + INTERVAL 7 DAY AS day, n FROM daily
  UNION ALL SELECT day + INTERVAL 14 DAY, n FROM daily
  UNION ALL SELECT day + INTERVAL 21 DAY, n FROM daily
  UNION ALL SELECT day + INTERVAL 28 DAY, n FROM daily
),
agg AS (SELECT day, SUM(n) AS season_sum, COUNT(*) AS k_window FROM b GROUP BY day),
w AS (
  SELECT d.day, d.n,
         COALESCE(season_sum, 0) AS season_sum,
         COALESCE(k_window, 0) AS k_window
  FROM daily d LEFT JOIN agg USING (day)
)
SELECT day, n, CAST(k_window AS BIGINT) AS k_window,
       CAST(season_sum AS BIGINT) AS season_sum,
       (k_window >= 2 AND 2 * ABS(n * k_window - season_sum) > season_sum)
         AS is_anomaly
FROM w
""",
)
def q10_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q10 (extension): SEASONAL volume anomaly — today vs the mean of
    the same weekday over the trailing 4 weeks (seasonal-naive
    baseline).  Completes the anomaly triptych: q7 flat trailing mean,
    q8 recency-decayed EWMA, q10 seasonality-aware — a weekly-cyclic
    ingest (weekend dips) trips q7 every Saturday but q10 never, and
    a flat series with one genuine spike trips all three.  All
    arithmetic exact int64 (denominators cleared).

    Delegates to ``seasonal_anomaly_flags``."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return seasonal_anomaly_flags(daily, period=7, n_periods=4)


def token_js_divergence(
    docs: DataFrame,
    top_k: int = 50,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """q11's engine: Jensen-Shannon divergence between each group's
    TOKEN distribution and the corpus's, over the corpus's ``top_k``
    most frequent tokens (count desc, token asc — the j54 bounded-vocab
    derivation) with both distributions renormalized to that vocabulary.
    q5's PSI drifts NUMERIC columns; this is the text-side counterpart
    a curation pipeline runs per source/shard/snapshot — JSD is
    symmetric, bounded by ln 2, and zero iff the distributions agree on
    the vocabulary, so per-source scores are directly comparable.

        JSD(P‖Q) = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m),  m = (p+q)/2

    Cross-engine exactness: p and q are exact integer-count ratios; ln
    is the only implementation-defined op, so each TOKEN's summand is
    quantized to integer NANO-nats before the order-free per-group sum
    (the j30/j54 micro-nat treatment, one decade finer because top-50
    probabilities are O(1e-2)).  Absent tokens contribute only the
    ½·q·ln(q/m) = ½·q·ln 2 term, via an explicit cs > 0 guard mirrored
    in the oracle.

    Plan shape: one token explode feeds two vocab-bounded partial aggs;
    the top-k table (and the 1-row total) BROADCAST onto a groups ×
    top_k grid (|groups|·top_k rows); one final groupBy releases
    (source, n_topk_present, jsd_nano).  Nothing shuffles more than
    the per-group token counts."""
    toks = docs.select(
        F.col(group_col).alias("grp"), F.explode(F.split(text_col, " ")).alias("tok")
    )
    cq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cq"))
    topk = cq.orderBy(F.col("cq").desc(), F.col("tok").asc()).limit(top_k)
    tq = topk.agg(F.sum("cq").alias("tq"))
    sc_ = (
        toks.join(F.broadcast(topk.select("tok")), "tok")
        .groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    ts = sc_.groupBy("grp").agg(F.sum("cs").alias("ts"))
    grid = ts.crossJoin(F.broadcast(topk))
    j = (
        grid.join(sc_, ["grp", "tok"], "left")
        .withColumn("cs", F.coalesce(F.col("cs"), F.lit(0)))
        .crossJoin(F.broadcast(tq))
    )
    p = F.col("cs").cast("double") / F.col("ts")
    qv = F.col("cq").cast("double") / F.col("tq")
    m = (p + qv) / F.lit(2.0)
    contrib = F.when(
        F.col("cs") > 0, F.lit(0.5) * p * F.log(p / m)
    ).otherwise(F.lit(0.0)) + F.lit(0.5) * qv * F.log(qv / m)
    c = j.select(
        "grp",
        F.when(F.col("cs") > 0, 1).otherwise(0).alias("present"),
        F.round(contrib * 1e9).cast("long").alias("nano"),
    )
    return (
        c.groupBy("grp")
        .agg(
            F.sum("present").cast("long").alias("n_topk_present"),
            F.sum("nano").alias("jsd_nano"),
        )
        .select(F.col("grp").alias("source"), "n_topk_present", "jsd_nano")
    )


@register(
    "q11_token_js_divergence",
    oracle="""
WITH toks AS (SELECT source AS grp, unnest(string_split(text, ' ')) AS tok
              FROM documents),
cq AS (SELECT tok, COUNT(*) AS cq FROM toks GROUP BY tok),
topk AS (SELECT tok, cq FROM cq ORDER BY cq DESC, tok ASC LIMIT 50),
tq AS (SELECT SUM(cq) AS tq FROM topk),
sc AS (SELECT grp, tok, COUNT(*) AS cs FROM toks
       WHERE tok IN (SELECT tok FROM topk) GROUP BY grp, tok),
ts AS (SELECT grp, SUM(cs) AS ts FROM sc GROUP BY grp),
grid AS (SELECT ts.grp, ts.ts, k.tok, k.cq FROM ts CROSS JOIN topk k),
j AS (SELECT g.grp, g.ts, g.tok, g.cq, COALESCE(s.cs, 0) AS cs
      FROM grid g LEFT JOIN sc s ON s.grp = g.grp AND s.tok = g.tok),
c AS (SELECT grp,
             CASE WHEN cs > 0 THEN 1 ELSE 0 END AS present,
             CAST(ROUND((CASE WHEN cs > 0
                   THEN 0.5 * (cs::DOUBLE / ts)
                        * ln((cs::DOUBLE / ts)
                             / ((cs::DOUBLE / ts
                                 + cq::DOUBLE / (SELECT tq FROM tq)) / 2.0))
                   ELSE 0.0 END
                 + 0.5 * (cq::DOUBLE / (SELECT tq FROM tq))
                   * ln((cq::DOUBLE / (SELECT tq FROM tq))
                        / ((cs::DOUBLE / ts
                            + cq::DOUBLE / (SELECT tq FROM tq)) / 2.0)))
                 * 1000000000) AS BIGINT) AS nano
      FROM j)
SELECT grp AS source, CAST(SUM(present) AS BIGINT) AS n_topk_present,
       CAST(SUM(nano) AS BIGINT) AS jsd_nano
FROM c GROUP BY grp
""",
)
def q11_token_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 (extension): per-source token-distribution drift — JSD
    against the corpus distribution over the corpus top-50 vocabulary,
    released in integer nano-nats.  The text-side counterpart to q5's
    numeric PSI; the score every multi-source curation pipeline tracks
    per shard before mixing.  Delegates to ``token_js_divergence``."""
    d = load(spark, sf_dir, "documents").select(
        "source", F.lower(F.col("text")).alias("text")
    )
    return token_js_divergence(d, top_k=50)
