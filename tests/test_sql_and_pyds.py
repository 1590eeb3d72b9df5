"""SQL entry point + custom Python DataSource surfaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from ma_anonymization_etl_spark.sources.pydatasource import register_synthetic_source
from ma_anonymization_etl_spark.sql import run_sql
from tests.conftest import SF_ORACLE


def test_run_sql_full_catalyst_path(spark):
    df = run_sql(
        spark, SF_ORACLE,
        "SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment",
    )
    rows = {r["c_mktsegment"]: r["n"] for r in df.collect()}
    assert sum(rows.values()) == 1500 and len(rows) == 5


def test_run_sql_views_join(spark):
    n = run_sql(
        spark, SF_ORACLE,
        "SELECT n_name FROM nation JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA'",
    ).count()
    assert n == 5


def test_custom_datasource_stream_batches(spark):
    """The streaming reader paginates by offset and every row arrives
    exactly once across micro-batches."""
    from pyspark.sql import functions as F2

    from ma_anonymization_etl_spark.streaming.runner import run_until

    register_synthetic_source(spark)
    src = (
        spark.readStream.format("synthetic_events")
        .option("n", 600).option("batch_rows", 250).load()
    )
    agg = src.agg(
        F2.count("*").alias("n"),
        F2.sum("id").alias("sum_id"),
        F2.min("id").alias("min_id"),
        F2.max("id").alias("max_id"),
    )
    sink = run_until(
        agg, "pyds_stream_test", "complete",
        lambda s: (s.first() or {"n": 0})["n"] == 600,
    )
    r = sink.first()
    # Exactly-once: count and closed-form sum both match (a replayed
    # micro-batch would inflate both; a skipped one would deflate them).
    assert r["n"] == 600
    assert r["sum_id"] == 600 * 599 // 2
    assert r["min_id"] == 0 and r["max_id"] == 599


def test_custom_datasource_partitions_and_values(spark):
    register_synthetic_source(spark)
    df = spark.read.format("synthetic_events").option("n", 1000).option("parts", 5).load()
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 1000
    # Executor-side closed form: id i -> (i % 10, (i*7 % 100)/4.0).
    r = df.filter(F.col("id") == 123).first()
    assert r["grp"] == 3 and r["val"] == (123 * 7 % 100) / 4.0
    # Uneven split: last partition short.
    df2 = spark.read.format("synthetic_events").option("n", 10).option("parts", 4).load()
    assert df2.count() == 10 and df2.rdd.getNumPartitions() == 4


def test_package_api_facade():
    """`import ma_anonymization_etl_spark as mael; mael.anonymize...`
    is the switcher's entry point — every advertised submodule resolves
    lazily and unknown attributes raise AttributeError."""
    import pytest as _pytest

    import ma_anonymization_etl_spark as mael

    for name in mael.__all__:
        assert getattr(mael, name) is not None
    with _pytest.raises(AttributeError):
        mael.not_a_module
