"""Kafka streaming source wrapper (SURVEY §2.A stretch).

The container has no broker and no spark-sql-kafka connector jar, so the
*connection* cannot be exercised here; what IS real and tested:

- ``kafka_stream_reader`` — the configured ``DataStreamReader`` (format +
  options), the piece a deployment pairs with
  ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.
- ``parse_kafka_value`` — the wire-format decode (Kafka's fixed output
  schema ``key/value: binary, topic, partition, offset, timestamp`` →
  typed event columns via ``from_json``).  Pure column logic: unit tests
  run it against a static DataFrame shaped like the Kafka source output,
  which is exactly what the streaming micro-batch would contain.

Scale notes: one Kafka partition maps to one Spark input partition — size
topic partitions to the executor count; ``maxOffsetsPerTrigger`` bounds
micro-batch size; watermark + dropDuplicates on a message key gives
at-least-once → effectively-once (see k6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader

KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, offset BIGINT, "
    "timestamp TIMESTAMP, timestampType INT"
)


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataStreamReader:
    """Configured Kafka ``readStream`` (call ``.load()`` where the
    connector jar is on the classpath)."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r


def parse_kafka_value(raw: DataFrame, value_schema: str, drop_corrupt: bool = True) -> DataFrame:
    """Kafka wire rows → typed event rows: cast ``value`` bytes to string,
    ``from_json`` against ``value_schema``, keep source position columns
    (topic/partition/offset) for lineage/exactly-once bookkeeping.
    PERMISSIVE ``from_json`` turns a corrupt payload into a struct whose
    fields are all NULL (not a NULL struct); ``drop_corrupt`` filters rows
    where every parsed field is NULL."""
    from pyspark.sql.types import StructType

    parsed = raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    )
    if drop_corrupt:
        from functools import reduce

        fields = [f.name for f in StructType.fromDDL(value_schema).fields]
        any_field = reduce(
            lambda a, b: a | b, [F.col(f"v.{n}").isNotNull() for n in fields]
        )
        parsed = parsed.filter(F.col("v").isNotNull() & any_field)
    return parsed.select(
        "kafka_key", "v.*", "topic", "partition", "offset", "kafka_ts"
    )


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False
