"""Skew-salting utility: the two-stage aggregate must equal the direct
groupBy exactly (scaled-int sums are associative), including on a
deliberately skewed input (90% of rows under one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ma_anonymization_etl_spark.functions.skew import salted_sum_count
from ma_anonymization_etl_spark.sources.io import load
from tests.conftest import SF_ORACLE


def _direct(df, key, value):
    return df.groupBy(key).agg(
        (F.sum(F.floor(F.col(value) * 10000)).cast("double") / 10000).alias(f"sum_{value}"),
        F.count("*").alias("n"),
    )


def test_salted_equals_direct_on_events(spark):
    e = load(spark, SF_ORACLE, "events")
    got = {
        r["user_id"]: (r["sum_value"], r["n"])
        for r in salted_sum_count(e, ["user_id"], "value", buckets=16).collect()
    }
    want = {
        r["user_id"]: (r["sum_value"], r["n"])
        for r in _direct(e, "user_id", "value").collect()
    }
    assert got == want


def test_salted_equals_direct_on_skewed_input(spark):
    # 90% of rows on key 0 — the case plain groupBy would hot-spot.
    rows = [(0 if i % 10 else i, float(i % 97) + 0.25) for i in range(20_000)]
    df = spark.createDataFrame(rows, "k LONG, v DOUBLE")
    got = sorted(salted_sum_count(df, ["k"], "v", buckets=8).collect())
    want = sorted(_direct(df, "k", "v").collect())
    assert got == want


def test_salt_is_deterministic(spark):
    from ma_anonymization_etl_spark.functions.skew import with_salt

    e = load(spark, SF_ORACLE, "events").limit(500)
    a = {r["event_id"]: r["__salt"] for r in with_salt(e, ["user_id"], 16).collect()}
    b = {r["event_id"]: r["__salt"] for r in with_salt(e, ["user_id"], 16).collect()}
    assert a == b
    assert len(set(a.values())) > 4  # actually spreads


def test_salted_join_row_identity_on_skewed_input(spark):
    from ma_anonymization_etl_spark.operators.relational import salted_join

    # 90% of big-side rows on key 0 — the case a plain shuffle join
    # would funnel into one reducer task.
    rows = [(0 if i % 10 else i % 7, i) for i in range(20_000)]
    big = spark.createDataFrame(rows, "k LONG, v LONG")
    small = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (3, "b"), (99, "unmatched")], "k2 LONG, tag STRING"
    )
    got = sorted(tuple(r) for r in salted_join(big, small, "k", "k2").collect())
    want = sorted(tuple(r) for r in big.join(small, F.col("k") == F.col("k2")).collect())
    assert got == want
    assert len(got) > 18_000  # the hot key really joined
