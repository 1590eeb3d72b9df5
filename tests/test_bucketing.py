"""Bucketed-join proof (SCALE.md): writing both fact tables bucketed by
the join key lets the SortMergeJoin run with NO Exchange on either side
— the shuffle that dominates fact-fact joins at 100 TB disappears at
write time.  This test materializes the claim."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.sources.io import load
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    # warehouse.dir is static — write EXTERNAL bucketed tables at an
    # explicit path instead.
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load(spark, SF_ORACLE, name)
            .write.mode("overwrite")
            .option("path", str(wh / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        o = spark.table("b_orders").select("o_orderkey", "o_orderpriority")
        li = spark.table("b_lineitem").select("l_orderkey", "l_extendedprice")
        j = o.join(li, o.o_orderkey == li.l_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles:\n" + plan
        # And it computes the same answer as the unbucketed join.
        expected = (
            load(spark, SF_ORACLE, "orders")
            .join(
                load(spark, SF_ORACLE, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucket_pruning_single_key_scan(spark, bucketed_tables):
    """Point lookups on the bucket key scan one bucket, not eight.
    (autoBucketedScan disables bucketed scans when no join needs the
    distribution — force it on to observe the pruning.)"""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        df = spark.table("b_orders").filter(F.col("o_orderkey") == 42)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert df.count() == 1
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")