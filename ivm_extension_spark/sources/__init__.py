from ivm_extension_spark.sources.formats import (
    read_any,
    read_stream,
    write_bucketed,
    write_partitioned,
)
from ivm_extension_spark.sources.parquet import ensure_parallelism, read_parquet

__all__ = [
    "ensure_parallelism",
    "read_any",
    "read_parquet",
    "read_stream",
    "write_bucketed",
    "write_partitioned",
]
