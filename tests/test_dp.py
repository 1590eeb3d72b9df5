"""Property tests for the differential-privacy release family (i28-i30)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ma_anonymization_etl_spark.operators import dp
from tests.conftest import SF_ORACLE

# The clamp in perturb_laplace bounds |noise| at b * ln(1/(2e-12)) ≈ 26.9b.
_NOISE_CAP = math.log(1 / (2e-12))


def test_hash_uniform_deterministic_and_in_range(spark):
    df = spark.range(0, 1000).select(
        dp.hash_uniform(F.col("id"), "t|").alias("u1"),
        dp.hash_uniform(F.col("id"), "t|").alias("u2"),
        dp.hash_uniform(F.col("id"), "other|").alias("u3"),
    )
    row = df.agg(
        F.min("u1").alias("lo"),
        F.max("u1").alias("hi"),
        F.sum((F.col("u1") != F.col("u2")).cast("int")).alias("nondet"),
        F.sum((F.col("u1") == F.col("u3")).cast("int")).alias("salt_collisions"),
        F.avg("u1").alias("mean"),
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0
    assert row.nondet == 0, "same salt+key must give the same uniform"
    assert row.salt_collisions < 5, "different salts must decorrelate"
    assert abs(row.mean - 0.5) < 0.05, "uniform mean near 0.5"


def test_dp_count_noise_bounded(spark):
    out = dp.i28_dp_count(spark, SF_ORACLE).collect()
    b = 2.0  # epsilon 0.5, sensitivity 1
    assert all(abs(r.n_noisy - r.n_exact) <= b * _NOISE_CAP + 1e-6 for r in out)
    assert all(r.epsilon == 0.5 for r in out)
    # Noise actually present: not every noisy count equals the exact one.
    assert any(abs(r.n_noisy - r.n_exact) > 1e-9 for r in out)


def test_dp_sum_clipping_bounds_sensitivity(spark):
    out = dp.i29_dp_sum_clipped(spark, SF_ORACLE).collect()
    b = 1000.0  # clip hi / epsilon
    for r in out:
        assert 0.0 <= r.sum_exact <= r.n_exact * 1000.0, "clipped sum inside [0, n*hi]"
        assert abs(r.sum_noisy - r.sum_exact) <= b * _NOISE_CAP + 1e-6


def test_dp_histogram_parallel_composition(spark):
    out = dp.i30_dp_histogram(spark, SF_ORACLE).collect()
    assert all(r.composition == "laplace-parallel" for r in out)
    assert all(r.epsilon_total == 1.0 for r in out)
    # Bins partition orders: exact counts reconstruct the table size.
    from ma_anonymization_etl_spark.sources.io import load

    assert sum(r.n_exact for r in out) == load(spark, SF_ORACLE, "orders").count()


def test_synthetic_marginals_preserved(spark):
    """i32: per-nation row counts are preserved exactly; every synthetic
    balance is a bin midpoint inside a bin that actually occurs for
    that nation; no synthetic row equals its source row's raw value
    unless that value happens to sit at a midpoint."""
    from ma_anonymization_etl_spark.operators.dp import i32_synthetic_marginals
    from ma_anonymization_etl_spark.sources.io import load

    out = i32_synthetic_marginals(spark, SF_ORACLE)
    orig = load(spark, SF_ORACLE, "customer")
    o_counts = {r[0]: r[1] for r in orig.groupBy("c_nationkey").count().collect()}
    s_counts = {r[0]: r[1] for r in out.groupBy("c_nationkey").count().collect()}
    assert o_counts == s_counts, "marginal counts must be preserved exactly"
    valid_bins = {
        (r[0], r[1])
        for r in orig.select(
            "c_nationkey", F.floor(F.col("c_acctbal") / 500).cast("long")
        ).distinct().collect()
    }
    for r in out.collect():
        b = int((r.synth_bal - 250.0) // 500)
        assert (r.c_nationkey, b) in valid_bins
        assert (r.synth_bal - 250.0) % 500 == 0, "values are bin midpoints"
