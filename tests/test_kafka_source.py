"""Kafka source wrapper: the decode path runs for real against a static
DataFrame shaped exactly like the Kafka source output (the connector jar /
broker are absent in this container — see sources/kafka.py docstring)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader

from ma_anonymization_etl_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_available,
    kafka_stream_reader,
    parse_kafka_value,
)

EVENT_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"


def _wire_df(spark, payloads):
    rows = [
        (
            str(i).encode(),
            p.encode(),
            "events",
            i % 4,
            i,
            None,
            0,
        )
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)


def test_parse_kafka_value_decodes_json(spark):
    payloads = [
        json.dumps({"event_id": i, "user_id": i % 3, "event_type": "click", "value": 0.5 * i})
        for i in range(10)
    ]
    out = parse_kafka_value(_wire_df(spark, payloads), EVENT_SCHEMA)
    assert out.columns == [
        "kafka_key", "event_id", "user_id", "event_type", "value",
        "topic", "partition", "offset", "kafka_ts",
    ]
    rows = {r["event_id"]: r for r in out.collect()}
    assert len(rows) == 10
    assert rows[4]["value"] == 2.0 and rows[4]["kafka_key"] == "4"
    assert rows[7]["partition"] == 3 and rows[7]["offset"] == 7


def test_parse_kafka_value_drops_corrupt(spark):
    payloads = [json.dumps({"event_id": 1, "user_id": 1, "event_type": "x", "value": 1.0}),
                "{not json at all"]
    good = parse_kafka_value(_wire_df(spark, payloads), EVENT_SCHEMA)
    assert good.count() == 1
    kept = parse_kafka_value(_wire_df(spark, payloads), EVENT_SCHEMA, drop_corrupt=False)
    assert kept.count() == 2
    assert kept.filter(F.col("event_id").isNull()).count() == 1


def test_kafka_reader_spec_builds_without_connector(spark):
    r = kafka_stream_reader(
        spark, "broker:9092", "events",
        starting_offsets="latest", max_offsets_per_trigger=50000,
    )
    assert isinstance(r, DataStreamReader)
    # The spec itself must be constructible with no connector on the
    # classpath; only .load() needs the jar (and this container lacks it).
    assert not kafka_available(spark)
