"""SQL API surface — run ANSI SQL directly against the engine.

A user of the reference can submit SQL text instead of building DataFrame
plans; ``run_sql`` registers the corpus tables as temp views and hands the
text to Spark's SQL parser, so the full Catalyst pipeline (analysis →
optimization → AQE) applies unchanged.

The TPC-H-style demo queries (operators/sql_queries.py) are written in a
dialect-portable subset: ONE SQL text serves as both the Spark query and
the DuckDB oracle, which is the strongest possible parity statement —
no per-engine translation at all.  Portability rules used there:
TIMESTAMP literals (the corpus date columns are timestamps), sql_dsum for
float sums, explicit tie-broken ORDER BY before every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ma_anonymization_etl_spark.sources.io import load

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register corpus parquet tables as session temp views (idempotent)."""
    for t in tables or TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """The SQL entry point: views + spark.sql.  Lazy — callers get the
    usual unexecuted DataFrame."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
