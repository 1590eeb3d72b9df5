"""Event/stream operators, batch-first — SURVEY.md §2 group K.

The `events` table is the stream (TESTDATA.md); every operator here is
the *batch form* so the DuckDB oracle applies.  The streaming module
wraps the same transforms in readStream/foreachBatch and asserts
stream-output == batch-output (SURVEY §5.3).

Scale: tumbling/sliding windows groupBy a derived bucket column →
ordinary partial-aggregated shuffles; sessionization is one window
shuffle on user_id.  In streaming form the same plans run incrementally
with watermark-bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

_SCALE = 10000

_SQL_SUM_VALUE = (
    f"CAST(SUM(CAST(FLOOR(value * {_SCALE}) AS BIGINT)) AS DOUBLE) / {_SCALE}"
)


@register(
    "k1_win_tumbling",
    oracle=f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws,
       time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS we,
       event_type, COUNT(*) AS n, {_SQL_SUM_VALUE} AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def k1_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k1: 1 h tumbling window counts/sums per event type.  Both engines
    align hour buckets to the epoch, so bucket edges agree."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * _SCALE)).cast("double") / _SCALE).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "k2_win_sliding",
    oracle=f"""
SELECT ws, ws + INTERVAL 1 HOUR AS we, event_type,
       COUNT(*) AS n, {_SQL_SUM_VALUE} AS sum_value
FROM (
  SELECT e.*, time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS ws
  FROM events e, (SELECT unnest(range(4)) AS k) ks
)
GROUP BY 1, 2, 3
""",
)
def k2_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k2: 1 h window sliding every 15 min — each event lands in 4
    windows.  The oracle reconstructs the 4 memberships by shifting the
    15-min bucket; Spark's F.window does the same expansion natively."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * _SCALE)).cast("double") / _SCALE).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# Shared sessionization SQL (k3 oracle; also the k4 cross-check base).
_SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, {_SQL_SUM_VALUE} AS sum_value
FROM numbered GROUP BY user_id, session_id
"""


@register("k3_win_session_batch", oracle=_SESSION_SQL)
def k3_win_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k3: gap-based sessionization (gap > 30 min ⇒ new session) via the
    classic lag → flag → running-sum pattern; one shuffle on user_id."""
    order = ["ts", "event_id"]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    gap_us = 30 * 60 * 1_000_000
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w_lag).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_lag)) > gap_us),
            1,
        ).otherwise(0),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * _SCALE)).cast("double") / _SCALE).alias("sum_value"),
        )
    )


@register(
    "k4_win_session_native",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, session_id
""",
)
def k4_win_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k4: Spark-native session_window.  Semantics differ from k3 in two
    documented ways the oracle mirrors: the window end is last_event +
    gap (not max(ts)), and an exactly-gap-sized silence starts a new
    session (end-exclusive)."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "k6_stream_dedup",
    oracle="""
SELECT DISTINCT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type FROM events
  UNION ALL
  SELECT event_id, user_id, event_type FROM events
)
""",
)
def k6_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k6: exactly-once by event_id — batch form of streaming
    dropDuplicates+watermark.  The corpus has unique event_ids, so the
    duplicate load is constructed by self-union; survivor rows are
    identical so which one survives is immaterial."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    return e.unionByName(e).dropDuplicates(["event_id"])


@register(
    "k8_stream_static_join",
    oracle=f"""
SELECT c_mktsegment, event_type, COUNT(*) AS n, {_SQL_SUM_VALUE} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment, event_type
""",
)
def k8_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k8: enrich the event stream with a static dimension — broadcast
    the dim so the streaming form needs no stateful shuffle."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.floor(F.col("value") * _SCALE)).cast("double") / _SCALE).alias("sum_value"),
        )
    )


@register(
    "k11_funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click'
    AND e.ts > v.t_signup AND e.ts <= v.t_signup + INTERVAL 24 HOUR
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_buy
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase'
    AND e.ts > c.t_click AND e.ts <= c.t_click + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_click_24h,
       (SELECT COUNT(*) FROM p) AS n_purchase_24h
""",
)
def k11_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k11: ordered, time-bounded funnel signup → click(≤24 h) →
    purchase(≤24 h of the click) — per-user stage timestamps via chained
    conditional-min windows on ONE user_id exchange (Spark reuses the
    partitioning across the three window ops), then a single-row
    conversion report.  The oracle takes the equivalent three-CTE join
    form; at sf0.01 the stages are 150 → 65 → 29, so step order and the
    time bounds are all load-bearing."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")
    w = Window.partitionBy("user_id")
    staged = (
        e.withColumn(
            "t_signup",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_signup"))
                    & (F.col("ts") <= F.col("t_signup") + day),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_buy",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click"))
                    & (F.col("ts") <= F.col("t_click") + day),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_signup").alias("t0"),
        F.max("t_click").alias("t1"),
        F.max("t_buy").alias("t2"),
    )
    return per_user.agg(
        F.count("t0").alias("n_signup"),
        F.count("t1").alias("n_click_24h"),
        F.count("t2").alias("n_purchase_24h"),
    )


@register(
    "k12_date_spine_densify",
    oracle="""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1 FROM events
), spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT u.user_id, s.day, COALESCE(p.n, 0) AS n_events
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN spine s
LEFT JOIN per_day p ON p.user_id = u.user_id AND p.day = s.day
""",
)
def k12_date_spine_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k12: date-spine densification — every (user, day) cell of the
    observed date range, zero-filled where no events landed (the
    gap-filling step before rolling averages or retention curves can be
    computed honestly).  The spine derives from ONE 1-row min/max
    aggregate exploded into days and broadcast against the distinct
    users; the only corpus-sized shuffle is the per-(user, day)
    pre-aggregate, so the grid never touches raw events.  At 100 TB the
    grid is users × days rows — generate it bucketed by user if it must
    be materialized."""
    e = load(spark, sf_dir, "events").select("user_id", F.to_date("ts").alias("day"))
    bounds = e.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    users = e.select("user_id").distinct()
    per_day = e.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    return (
        users.crossJoin(F.broadcast(spine))
        .join(per_day, ["user_id", "day"], "left")
        .select(
            "user_id", "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_events")
        )
    )


def _bucket_grid(e: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared k19/k20 scaffolding: (obs, grid) where ``obs`` holds one
    survivor observation per (user, 4 h bucket) — latest ts, event_id
    tie-break — and ``grid`` is the dense user × bucket rectangle over
    the observed range (spine from ONE 1-row min/max, broadcast)."""
    w_pick = Window.partitionBy("user_id", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    obs = (
        e.withColumn("bucket", F.window("ts", "4 hours")["start"])
        .withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select("user_id", "bucket", F.col("value").alias("obs_value"))
    )
    bounds = obs.agg(F.min("bucket").alias("d0"), F.max("bucket").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 4 hours)")).alias("bucket")
    )
    grid = e.select("user_id").distinct().crossJoin(F.broadcast(spine))
    return obs, grid


@register(
    "k19_resample_locf",
    oracle="""
WITH obs AS (
  SELECT user_id, bucket, value AS obs_value FROM (
    SELECT user_id, time_bucket(INTERVAL 4 HOUR, ts) AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, time_bucket(INTERVAL 4 HOUR, ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
), bounds AS (
  SELECT MIN(bucket) AS d0, MAX(bucket) AS d1 FROM obs
), spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 4 HOUR)) AS bucket FROM bounds
), grid AS (
  SELECT u.user_id, s.bucket
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s
)
SELECT g.user_id, g.bucket,
       last_value(o.obs_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING) AS value_locf,
       CASE WHEN o.obs_value IS NULL THEN 0 ELSE 1 END AS is_observed
FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
""",
)
def k19_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k19: time-series resampling with last-observation-carried-forward
    gap fill — the value-level companion to k12's zero-filled counts
    (TimescaleDB's time_bucket_gapfill + locf shape).  Per user the
    irregular event series is bucketed to a 4 h grid (deterministic
    survivor: latest ts, event_id tie-break), densified against a spine
    derived from ONE 1-row min/max aggregate, and forward-filled with a
    single `last(value, ignorenulls=True)` running window.  Cells before
    a user's first observation stay NULL (no back-fill).  Scale: the
    only corpus-sized shuffle is the per-(user, bucket) pre-aggregate;
    the spine is broadcast and the fill is one window pass over the
    compact grid, so raw events are never re-shuffled.  Both engines
    align 4 h buckets to epoch-divisible origins, so bucket edges agree."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    obs, grid = _bucket_grid(e)
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.last("obs_value", ignorenulls=True).over(w_fill).alias("value_locf"),
            F.when(F.col("obs_value").isNull(), 0).otherwise(1).alias("is_observed"),
        )
    )


@register(
    "k20_interpolate_linear",
    oracle="""
WITH obs AS (
  SELECT user_id, bucket, value AS obs_value FROM (
    SELECT user_id, time_bucket(INTERVAL 4 HOUR, ts) AS bucket, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, time_bucket(INTERVAL 4 HOUR, ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events)
  WHERE rn = 1
), bounds AS (
  SELECT MIN(bucket) AS d0, MAX(bucket) AS d1 FROM obs
), spine AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 4 HOUR)) AS bucket FROM bounds
), grid AS (
  SELECT u.user_id, s.bucket
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN spine s
), joined AS (
  SELECT g.user_id, g.bucket, o.obs_value,
         CAST(epoch(g.bucket) AS DOUBLE) AS t
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
), ctx AS (
  SELECT *,
         last_value(obs_value IGNORE NULLS) OVER w_prev AS prev_val,
         last_value(CASE WHEN obs_value IS NOT NULL THEN t END IGNORE NULLS)
           OVER w_prev AS prev_t,
         first_value(obs_value IGNORE NULLS) OVER w_next AS next_val,
         first_value(CASE WHEN obs_value IS NOT NULL THEN t END IGNORE NULLS)
           OVER w_next AS next_t
  FROM joined
  WINDOW w_prev AS (PARTITION BY user_id ORDER BY bucket ROWS UNBOUNDED PRECEDING),
         w_next AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, bucket,
       CASE WHEN obs_value IS NOT NULL THEN ROUND(obs_value, 6)
            WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
            ELSE ROUND(prev_val + (next_val - prev_val)
                       * ((t - prev_t) / (next_t - prev_t)), 6) END AS value_interp,
       CASE WHEN obs_value IS NOT NULL THEN 'obs'
            WHEN prev_val IS NULL OR next_val IS NULL THEN 'edge'
            ELSE 'interp' END AS kind
FROM ctx
""",
)
def k20_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k20: linear interpolation of interior gaps on the k19 resample
    grid — value = prev + (next − prev)·(t − t_prev)/(t_next − t_prev),
    from the nearest observed neighbors on each side (two IGNORE NULLS
    windows over the same user partitioning, so Spark reuses one
    exchange).  Grid edges with no neighbor on one side stay NULL
    ('edge'); observed cells pass through ('obs').  Both engines
    evaluate the identical IEEE-double expression, rounded to 6 dp.
    Scale: same profile as k19 — one pre-aggregate shuffle plus window
    passes over the compact (user × bucket) grid."""
    e = load(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    obs, grid = _bucket_grid(e)
    joined = grid.join(obs, ["user_id", "bucket"], "left").withColumn(
        "t", F.unix_seconds("bucket").cast("double")
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_obs = F.when(F.col("obs_value").isNotNull(), F.col("t"))
    ctx = (
        joined.withColumn("prev_val", F.last("obs_value", ignorenulls=True).over(w_prev))
        .withColumn("prev_t", F.last(t_obs, ignorenulls=True).over(w_prev))
        .withColumn("next_val", F.first("obs_value", ignorenulls=True).over(w_next))
        .withColumn("next_t", F.first(t_obs, ignorenulls=True).over(w_next))
    )
    interp = F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * (
        (F.col("t") - F.col("prev_t")) / (F.col("next_t") - F.col("prev_t"))
    )
    no_side = F.col("prev_val").isNull() | F.col("next_val").isNull()
    return ctx.select(
        "user_id",
        "bucket",
        F.when(F.col("obs_value").isNotNull(), F.round("obs_value", 6))
        .when(no_side, F.lit(None).cast("double"))
        .otherwise(F.round(interp, 6))
        .alias("value_interp"),
        F.when(F.col("obs_value").isNotNull(), F.lit("obs"))
        .when(no_side, F.lit("edge"))
        .otherwise(F.lit("interp"))
        .alias("kind"),
    )


@register(
    "k13_retention_cohorts",
    oracle="""
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort FROM act GROUP BY user_id
)
SELECT f.cohort, datediff('day', f.cohort, a.day) AS day_offset,
       COUNT(*) AS n_active
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
)
def k13_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k13: retention cohort matrix — users grouped by first-seen day,
    activity counted per (cohort, day offset): the classic retention
    triangle.  One pass builds the distinct (user, day) activity set;
    the cohort table derives from it (min per user) and joins back on
    user_id — both sides are already keyed by user, so AQE plans one
    shuffle each and the matrix aggregate runs on the compact activity
    set, never raw events."""
    act = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    first = act.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        act.join(first, "user_id")
        .groupBy(
            "cohort", F.datediff(F.col("day"), F.col("cohort")).alias("day_offset")
        )
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "k23_late_data_audit",
    oracle="""
WITH seq AS (
  SELECT event_type, ts,
         MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_hi
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts < wm_hi - INTERVAL 10 MINUTE THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       ROUND(SUM(CASE WHEN ts < wm_hi - INTERVAL 10 MINUTE THEN 1 ELSE 0 END)::DOUBLE
             / COUNT(*), 6) AS late_frac
FROM seq GROUP BY event_type
""",
)
def k23_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k23 (extension): per-record late-data audit — for each event,
    would a 10-minute watermark have classified it late on arrival?
    Arrival order is the ingestion sequence (event_id), the watermark
    is the running max event-time over everything that arrived EARLIER,
    and an event is late when it trails that mark by more than the
    delay — the exact record-level rule behind withWatermark, which
    Spark applies but never reports.  k5 measures the window-close drop
    rule; this quantifies the dead-letter stream an ingestion pipeline
    should quarantine rather than silently lose (per type, count and
    share — the number that tells you whether 10 minutes is the right
    delay).

    Scale note: the demo's global arrival sequence needs ONE ordered
    window (single-partition sort — the n5 caveat applies).  In
    production arrival order exists per Kafka partition, so the same
    window runs partitioned by (topic, partition) and distributes;
    lateness is always defined per ingestion lane, never globally."""
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    late = F.col("ts") < F.col("wm_hi") - F.expr("INTERVAL 10 MINUTES")
    return (
        e.withColumn("wm_hi", F.max("ts").over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(late.cast("int")).cast("long").alias("n_late"),
            F.round(
                F.sum(late.cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("late_frac"),
        )
    )
