from ma_anonymization_etl_spark.sources.io import load, table_path, write_parquet  # noqa: F401
