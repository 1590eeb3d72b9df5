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

import re

from pyspark.sql import DataFrame, SparkSession

from ma_anonymization_etl_spark.sources.io import load

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def referenced_tables(sql: str) -> list[str]:
    """Corpus tables whose names appear as identifiers in the SQL text.

    A word-boundary scan, not a parse — it can over-match (a table name
    inside a string literal) but never under-matches, so registration
    stays sound.  Over-registration costs one footer read, nothing more.
    """
    words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", sql.lower()))
    return [t for t in TABLES if t in words]


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register corpus parquet tables as session temp views (idempotent)."""
    for t in tables or TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """The SQL entry point: views + spark.sql.  Lazy — callers get the
    usual unexecuted DataFrame.

    Only the tables the query references are registered (falling back to
    all of them if the scan finds none): a query over one table must not
    touch — or depend on the readability of — the other nine datasets.
    """
    register_views(spark, sf_dir, referenced_tables(sql) or None)
    return spark.sql(sql)
