"""PySpark-native analytics/anonymization-ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `jaSunny/MA-Anonymization-ETL` project
(an anonymization ETL pipeline; see /root/repo/SURVEY.md — the
reference checkout is empty, so SURVEY.md §2 is the capability
contract, built from the driver's characterization in BASELINE.json
and the public SDC literature).

Design principles (SURVEY.md §4):
- Declarative DataFrame plans; Catalyst/Tungsten pick physical strategy.
- Native Column expressions on every hot path (no row-at-a-time UDFs).
- Broadcast small dimensions, AQE on, deterministic seeds everywhere.
"""

__version__ = "0.1.0"

# Public API facade — lazy so `import ma_anonymization_etl_spark` stays
# cheap for tooling; submodules import on first attribute access.
_API = {
    "anonymize": "ma_anonymization_etl_spark.operators.anonymize",
    "dp": "ma_anonymization_etl_spark.operators.dp",
    "etl": "ma_anonymization_etl_spark.operators.etl",
    "graph": "ma_anonymization_etl_spark.operators.graph",
    "llm": "ma_anonymization_etl_spark.operators.llm",
    "quality": "ma_anonymization_etl_spark.operators.quality",
    "similarity": "ma_anonymization_etl_spark.operators.similarity",
    "pipeline": "ma_anonymization_etl_spark.plans.pipeline",
    "registry": "ma_anonymization_etl_spark.registry",
    "session": "ma_anonymization_etl_spark.session",
    "sql": "ma_anonymization_etl_spark.sql",
    "io": "ma_anonymization_etl_spark.sources.io",
}

__all__ = sorted(_API)


def __getattr__(name: str):
    if name in _API:
        import importlib

        mod = importlib.import_module(_API[name])
        globals()[name] = mod  # cache: next access skips __getattr__
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
