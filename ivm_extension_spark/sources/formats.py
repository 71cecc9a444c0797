"""Generic source/sink surface: csv, json, parquet — batch and stream.

The reference stores everything in DuckDB's own catalog (tests use the
in-memory catalog only, tests/ivm.test:32); connectors are where the
Spark re-expression naturally widens the surface.  All readers funnel
into the same DataFrame substrate the engine consumes, so every
operator works identically over any of them.

Sink design for scale:

- ``write_partitioned``: hive-style directory partitioning — partition
  pruning turns point/range queries on the partition key into file
  skips; the pre-write ``repartition(*keys)`` makes one file per
  partition directory per shuffle task instead of tasks x partitions
  small files.
- ``write_bucketed``: bucketed+sorted ``saveAsTable`` — joins and
  group-bys on the bucket keys across tables with the same bucketing
  skip the shuffle entirely (Catalyst recognizes the co-partitioning).
  This is the materialization we'd use for IVM view state and aux state
  at cluster scale, where the per-batch merge is a co-partitioned join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ivm_extension_spark.sources.parquet import read_parquet


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read csv/json/parquet by format (inferred from the extension when
    ``fmt`` is None).  CSV defaults to header+inferSchema unless a
    schema is given (at scale always pass a schema: inference scans the
    data once before the real job)."""
    if fmt is None:
        low = path.rstrip("/").lower()
        for ext in ("parquet", "csv", "json", "orc"):
            if low.endswith("." + ext):
                fmt = ext
                break
        else:
            raise ValueError(f"cannot infer format from {path!r}; pass fmt=")
    if fmt == "parquet":
        if schema is None and not options:
            return read_parquet(spark, path)
        # an explicit schema or reader options bypass the cached
        # nanos-aware fast path (which serves one canonical plan per
        # path) — honor them instead of silently dropping them
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.options(**options).parquet(path)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", **options}
        if schema is None:
            opts.setdefault("inferSchema", "true")
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    raise ValueError(f"unsupported format {fmt!r}")


def read_stream(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-source stream (csv/json/parquet directory watched for new
    files).  Streams always need an explicit schema."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.options(**options).format(fmt).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned write; one file per partition dir per task via a
    pre-shuffle on the partition keys (avoids the small-files explosion)."""
    (
        df.repartition(*partition_by)
        .write.partitionBy(*partition_by)
        .format(fmt)
        .mode(mode)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...],
    n_buckets: int = 32,
    sort_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table: co-partitions
    future joins/aggregations on the bucket keys — the shuffle-free
    materialization for view/aux state at cluster scale."""
    w = df.write.bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.mode(mode).format("parquet").saveAsTable(table)
