"""Sources & sinks (SURVEY.md §2.A).

a1 parquet_scan · a2 csv/json read · a4 parquet_sink.  Streaming
sources/sinks (a5/a6) live in ``streaming/``.

Scale notes (100 TB): parquet scans here are plain
``spark.read.parquet`` so Catalyst's vectorized reader, predicate
pushdown, column pruning, and partition pruning all apply untouched.
Sinks write with ``partitionBy`` so downstream reads get partition
pruning / dynamic partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ma_anonymization_etl_spark.session import configure

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, table: str) -> str:
    return f"{sf_dir.rstrip('/')}/{table}.parquet"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """a1: columnar parquet scan; schema trusted from footers (SURVEY §1.3).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 cannot map to
    its µs TimestampType directly — with ``nanosAsLong`` (set in
    ``configure``) it arrives as BIGINT ns and we truncate to µs here,
    byte-identically to DuckDB's read_parquet conversion (verified on
    sub-µs values).  Downstream code always sees ``ts TIMESTAMP``.
    """
    configure(spark)  # UTC + AQE + nanosAsLong regardless of who built the session
    df = spark.read.parquet(table_path(sf_dir, table))
    if table == "events":
        from pyspark.sql import functions as F
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             header: bool = True, **options) -> DataFrame:
    """a2: CSV ingestion with an explicit schema (never inferSchema on
    100 TB — schema inference is a full extra pass over the data)."""
    configure(spark)
    return spark.read.csv(path, schema=schema, header=header, **options)


def read_json(spark: SparkSession, path: str, schema: StructType | str,
              **options) -> DataFrame:
    """a2: JSON-lines ingestion with an explicit schema."""
    configure(spark)
    return spark.read.json(path, schema=schema, **options)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """a4: parquet sink, optionally hive-partitioned.

    Partitioned layout is the scale lever: a sanitized 100 TB output
    partitioned by e.g. ship month lets every downstream reader prune.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
