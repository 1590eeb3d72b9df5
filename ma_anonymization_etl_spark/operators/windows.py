"""Window functions — SURVEY.md §2 group E.

All deterministic-by-construction: every ORDER BY inside a window
carries a unique tie-break key (event_id / o_orderkey / c_custkey),
otherwise ranks and frames are partition-order-dependent and the
oracle hash check (and any 100 TB rerun) would flap.

Scale: a window = one shuffle on the partition key + per-partition
sort.  Partition keys here (user_id, c_nationkey, o_custkey) are the
natural distribution keys; skewed users at 100 TB are handled by AQE
or by pre-aggregating per (user, coarse-time) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

_SCALE = 10000  # same scaled-int trick as functions.numeric.dsum


@register(
    "e1_win_row_number",
    oracle="""
SELECT event_id, user_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
""",
)
def e1_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e1: per-user event sequence numbers."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("rn", F.row_number().over(w))
        .drop("ts")
    )


@register(
    "e2_win_rank",
    oracle="""
SELECT c_custkey, c_nationkey, c_acctbal,
       RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_rank,
       DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS bal_dense_rank
FROM customer
""",
)
def e2_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e2: rank/dense_rank — tie rows get equal ranks, so no tie-break
    needed for determinism of the *values*."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .withColumn("bal_rank", F.rank().over(w))
        .withColumn("bal_dense_rank", F.dense_rank().over(w))
    )


@register(
    "e3_win_ntile",
    oracle="""
SELECT o_orderkey,
       NTILE(100) OVER (ORDER BY o_totalprice, o_orderkey) AS price_centile
FROM orders
""",
)
def e3_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e3: quantile bucket assignment (building block of top/bottom-coding
    i12).  NTILE *requires* the unique tie-break: tied prices land in
    different buckets depending on scan order otherwise."""
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("price_centile", F.ntile(100).over(w))
        .drop("o_totalprice")
    )


@register(
    "e4_win_lag_lead",
    oracle="""
SELECT event_id, user_id,
       LAG(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_event_id,
       LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
FROM events
""",
)
def e4_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e4: previous/next event per user (gap analysis building block)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("prev_event_id", F.lag("event_id").over(w))
        .withColumn("next_event_id", F.lead("event_id").over(w))
        .drop("ts")
    )


@register(
    "e5_win_running",
    oracle=f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(FLOOR(o_totalprice * {_SCALE}) AS BIGINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       / {_SCALE} AS running_total
FROM orders
""",
)
def e5_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e5: running total per customer — scaled-int64 running sum so the
    cumulative value is exact and engine-identical at every row."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .withColumn(
            "running_total",
            (F.sum(F.floor(F.col("o_totalprice") * _SCALE)).over(w).cast("double") / _SCALE),
        )
        .select("o_orderkey", "o_custkey", "running_total")
    )


@register(
    "e6_win_moving",
    oracle="""
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg
FROM events
""",
)
def e6_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e6: moving average over the last 4 events per user (≤4 doubles per
    frame → float error ~1e-13, ROUND(4) is safe on both sides)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("moving_avg", F.round(F.avg("value").over(w), 4))
        .select("event_id", "user_id", "moving_avg")
    )


@register(
    "e7_win_range_frame",
    oracle=f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(FLOOR(value * {_SCALE}) AS BIGINT)) OVER w AS DOUBLE)
       / {_SCALE} AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def e7_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e7: time-range frame — trailing 1 hour of events per user.  The
    range is expressed over epoch microseconds on both engines so frame
    boundary semantics are identical (numeric, inclusive)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("n_trailing_1h", F.count("*").over(w))
        .withColumn(
            "sum_trailing_1h",
            (F.sum(F.floor(F.col("value") * _SCALE)).over(w).cast("double") / _SCALE),
        )
        .select("event_id", "user_id", "n_trailing_1h", "sum_trailing_1h")
    )


@register(
    "e8_win_first_last",
    oracle="""
SELECT event_id, user_id,
       FIRST_VALUE(event_id) OVER w AS first_event_id,
       LAST_VALUE(event_id)  OVER w AS last_event_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def e8_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e8: first/last value with an explicit full-partition frame (the
    default frame stops at CURRENT ROW, which silently changes LAST_VALUE
    — classic cross-engine trap, avoided by spelling the frame out)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("first_event_id", F.first("event_id").over(w))
        .withColumn("last_event_id", F.last("event_id").over(w))
        .drop("ts")
    )


@register(
    "e9_win_dist",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       PERCENT_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS price_pct_rank,
       CUME_DIST()    OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS price_cume_dist
FROM orders
""",
)
def e9_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e9: distribution ranks — exact rationals (rank-1)/(n-1), identical
    IEEE division on both engines, no rounding needed."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn("price_pct_rank", F.percent_rank().over(w))
        .withColumn("price_cume_dist", F.cume_dist().over(w))
        .drop("o_totalprice")
    )


@register(
    "e10_win_conditional",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w
            AS BIGINT) AS clicks_trailing_1h,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w
            AS BIGINT) AS purchases_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def e10_win_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e10 (extension): CONDITIONAL aggregates over a time-range frame —
    per event, how many clicks and purchases the same user produced in
    the trailing hour (the behavioral features a real-time model
    consumes).  Composes e7's microsecond range frame with d8's
    sum-of-CASE conditionals; both type counters share one window, so
    Spark computes them in a single pass over one user_id exchange."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    clicks = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w)
    buys = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(w)
    return e.select(
        "event_id",
        "user_id",
        clicks.cast("long").alias("clicks_trailing_1h"),
        buys.cast("long").alias("purchases_trailing_1h"),
    )


@register(
    "e11_win_ignore_nulls",
    oracle="""
WITH sparse AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_id % 5 = 0 THEN value END AS v
  FROM events
)
SELECT user_id, event_id,
       CAST(FLOOR(COALESCE(
         LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING),
         -1) * 100) AS BIGINT) AS carried_cents,
       CAST(FLOOR(COALESCE(
         FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN CURRENT ROW
                                           AND UNBOUNDED FOLLOWING),
         -1) * 100) AS BIGINT) AS next_cents
FROM sparse
""",
)
def e11_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """e11: IGNORE NULLS window navigation — the sparse-measurement
    primitive under k19's LOCF resampling, exposed as its own surface:
    only every 5th event carries a reading; LAST_VALUE ... IGNORE
    NULLS carries the latest known reading forward per user
    (forward-fill) and FIRST_VALUE over the forward frame finds the
    next known reading (back-fill) — the two halves of every gap-fill
    / as-of lookup.  Rows before the first reading release -1
    sentinels (COALESCE), so the output is total.  Values ship as
    floor-cents; one shuffle on user_id."""
    e = load(spark, sf_dir, "events")
    sparse = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, F.col("value")).alias("v"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return sparse.select(
        "user_id",
        "event_id",
        F.floor(
            F.coalesce(F.last("v", ignorenulls=True).over(w_back), F.lit(-1)) * 100
        )
        .cast("long")
        .alias("carried_cents"),
        F.floor(
            F.coalesce(F.first("v", ignorenulls=True).over(w_fwd), F.lit(-1)) * 100
        )
        .cast("long")
        .alias("next_cents"),
    )
