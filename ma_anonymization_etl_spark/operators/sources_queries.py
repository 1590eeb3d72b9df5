"""Explicit registry entries for a1 (parquet scan) and i1 (column
classification) so SURVEY §2's inventory maps 1:1 onto queries()."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ma_anonymization_etl_spark.plans.pipeline import classify_columns
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load


@register(
    "a1_parquet_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def a1_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a1: the raw columnar scan — schema from parquet footers, values
    byte-identical to the oracle's read of the same file."""
    return load(spark, sf_dir, "region")


# The fixture classification for the customer table (FIXTURES.md roles).
CUSTOMER_ROLES = {
    "c_name": "di",
    "c_nationkey": "qi",
    "c_mktsegment": "qi",
    "c_acctbal": "sa",
    "c_custkey": "keep",
}


@register("i1_classify_columns")  # config-derived, not table-derived → rows-only
def i1_classify_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """i1: materialize the validated DI/QI/SA classification that drives
    the pipeline (the config is data too — auditable, joinable)."""
    roles = classify_columns(CUSTOMER_ROLES)
    rows = [(col, role) for role in sorted(roles) for col in sorted(roles[role])]
    return spark.createDataFrame(rows, "column_name STRING, role STRING")
