"""events.ts schema-adaptive load (VERDICT r2 item 1).

events.parquet stores ts as parquet TIMESTAMP(NANOS).  Spark builds
disagree about what that surfaces as (BIGINT ns when
spark.sql.legacy.parquet.nanosAsLong is honored, TIMESTAMP_NTZ on
PySpark >= 4.1.2 where the conf is inert).  ``normalize_events_ts``
must produce an identical µs TIMESTAMP either way, byte-equal to
DuckDB's read_parquet conversion.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.sources.io import load, normalize_events_ts
from tests.conftest import SF_ORACLE


def test_events_ts_is_timestamp_on_this_build(spark):
    # The driver hands us a session it built itself; whatever this build
    # surfaced the nanos column as, downstream code must see TIMESTAMP.
    df = load(spark, SF_ORACLE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_ts_matches_duckdb_exactly(spark):
    df = load(spark, SF_ORACLE, "events").select("event_id", "ts")
    got = {
        r["event_id"]: r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
        for r in df.collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') "
            f"FROM read_parquet('{SF_ORACLE}/events.parquet')"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_normalize_handles_bigint_ns_input(spark):
    # Simulate a nanosAsLong build: hand the normalizer BIGINT ns and
    # check it truncates to the same µs instants as the native read.
    native = load(spark, SF_ORACLE, "events").select("event_id", "ts")
    as_ns = native.select(
        "event_id",
        (F.unix_micros("ts") * 1000 + 999).alias("ts"),  # ns with sub-µs noise
    )
    renorm = normalize_events_ts(as_ns)
    assert dict(renorm.dtypes)["ts"] == "timestamp"
    diff = (
        renorm.alias("a")
        .join(native.alias("b"), "event_id")
        .filter(F.col("a.ts") != F.col("b.ts"))
        .count()
    )
    assert diff == 0


def test_normalize_is_noop_on_timestamp(spark):
    df = load(spark, SF_ORACLE, "events")
    again = normalize_events_ts(df)
    assert dict(again.dtypes)["ts"] == "timestamp"
    assert again.schema == df.schema
