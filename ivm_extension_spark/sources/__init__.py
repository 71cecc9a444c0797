from ivm_extension_spark.sources.parquet import read_parquet

__all__ = ["read_parquet"]
