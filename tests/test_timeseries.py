"""Property tests for the time-series gap-fill family (k19/k20).

The oracle parity tests already prove cross-engine equality; these pin
the semantics themselves: LOCF carries exactly the most recent observed
value, interpolation stays inside its neighbor envelope, and the grid
is the dense user × bucket rectangle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ma_anonymization_etl_spark.operators.events import (
    k19_resample_locf,
    k20_interpolate_linear,
)
from ma_anonymization_etl_spark.sources.io import load
from tests.conftest import SF_ORACLE


def test_k19_grid_is_dense_rectangle(spark):
    out = k19_resample_locf(spark, SF_ORACLE)
    n_users = out.select("user_id").distinct().count()
    n_buckets = out.select("bucket").distinct().count()
    assert out.count() == n_users * n_buckets


def test_k19_locf_carries_most_recent_observation(spark):
    out = k19_resample_locf(spark, SF_ORACLE).cache()
    try:
        # Observed cells: value_locf equals the bucket's own observation —
        # recompute the per-bucket survivor independently and compare.
        e = load(spark, SF_ORACLE, "events")
        survivor = (
            e.withColumn("bucket", F.window("ts", "4 hours")["start"])
            .groupBy("user_id", "bucket")
            .agg(F.max_by("value", F.struct("ts", "event_id")).alias("v"))
        )
        joined = out.filter("is_observed = 1").join(
            survivor, ["user_id", "bucket"], "inner"
        )
        assert joined.count() == out.filter("is_observed = 1").count()
        assert joined.filter("value_locf <> v").count() == 0

        # Filled cells: value_locf equals the latest observed cell before it.
        filled = out.alias("f").filter("f.is_observed = 0 AND f.value_locf IS NOT NULL")
        prev = out.alias("p").filter("p.is_observed = 1")
        bad = (
            filled.join(
                prev,
                (F.col("f.user_id") == F.col("p.user_id"))
                & (F.col("p.bucket") < F.col("f.bucket")),
            )
            .groupBy("f.user_id", "f.bucket", "f.value_locf")
            .agg(F.max_by("p.value_locf", "p.bucket").alias("expected"))
            .filter("value_locf <> expected")
        )
        assert bad.count() == 0

        # Cells before a user's first observation stay NULL.
        first_obs = (
            out.filter("is_observed = 1")
            .groupBy("user_id")
            .agg(F.min("bucket").alias("b0"))
        )
        leading = out.join(first_obs, "user_id").filter("bucket < b0")
        assert leading.filter("value_locf IS NOT NULL").count() == 0
    finally:
        out.unpersist()


def test_k20_interp_stays_in_neighbor_envelope(spark):
    out = k20_interpolate_linear(spark, SF_ORACLE).cache()
    try:
        kinds = {r["kind"] for r in out.select("kind").distinct().collect()}
        assert kinds <= {"obs", "interp", "edge"}
        assert out.filter("kind = 'edge' AND value_interp IS NOT NULL").count() == 0
        # Each interpolated value lies between the nearest observed values
        # on either side (inclusive envelope).
        obs = out.filter("kind = 'obs'").select(
            "user_id", F.col("bucket").alias("ob"), F.col("value_interp").alias("ov")
        )
        interp = out.filter("kind = 'interp'").select(
            "user_id", "bucket", "value_interp"
        )
        env = (
            interp.join(obs, "user_id")
            .groupBy("user_id", "bucket", "value_interp")
            .agg(
                F.max_by("ov", F.when(F.col("ob") < F.col("bucket"), F.col("ob"))).alias("prev_v"),
                F.min_by("ov", F.when(F.col("ob") > F.col("bucket"), F.col("ob"))).alias("next_v"),
            )
        )
        bad = env.filter(
            (F.col("value_interp") < F.least("prev_v", "next_v") - 1e-6)
            | (F.col("value_interp") > F.greatest("prev_v", "next_v") + 1e-6)
        )
        assert bad.count() == 0
    finally:
        out.unpersist()
