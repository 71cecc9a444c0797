from ivm_extension_spark.sources.parquet import ensure_parallelism, read_parquet

__all__ = ["ensure_parallelism", "read_parquet"]
