"""Central query registry — the contract surface for the driver.

Every operator from SURVEY.md §2 registers one demo query here:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
the equivalent DuckDB oracle SQL.  ``__spark_entry__.py`` exposes the
registry as ``queries()`` / ``oracle_sql()``.

Discipline enforced here by convention (SURVEY.md §5):
- alias every computed column identically in Spark and SQL;
- exact-decimal sums for large-magnitude double SUMs
  (see functions.numeric.dsum) — order-independent, engine-identical;
- ROUND(, 4..6) on inherently float accumulations (avg/stddev/corr);
- deterministic tie-breaks on every limit / row_number / dedup.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# Modules whose import populates the registry.
_OPERATOR_MODULES = [
    "ma_anonymization_etl_spark.operators.relational",
    "ma_anonymization_etl_spark.operators.sources_queries",
    "ma_anonymization_etl_spark.operators.sinks",
    "ma_anonymization_etl_spark.operators.windows",
    "ma_anonymization_etl_spark.operators.scalars",
    "ma_anonymization_etl_spark.operators.anonymize_queries",
    "ma_anonymization_etl_spark.operators.events",
    "ma_anonymization_etl_spark.operators.streaming_queries",
    "ma_anonymization_etl_spark.operators.llm",
    "ma_anonymization_etl_spark.operators.similarity",
    "ma_anonymization_etl_spark.operators.multimodal",
    "ma_anonymization_etl_spark.operators.udfs",
    "ma_anonymization_etl_spark.operators.sql_queries",
    "ma_anonymization_etl_spark.operators.etl",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # None → driver does rows-only check
    doc: str = ""


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a demo query under a SURVEY §2 id-prefixed name."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle}
