"""Parquet source with nanosecond-timestamp handling.

Spark 4 rejects parquet TIMESTAMP(NANOS) columns outright
(PARQUET_TYPE_ILLEGAL).  We detect them from the parquet footer via
pyarrow (driver-side, metadata only — no data read), enable the legacy
nanos-as-long decode, and rebuild a proper TIMESTAMP_NTZ column with
integer division (ns DIV 1000 — double division would lose precision
above 2^53 ns).  Cost at scale: one extra projected expression inside
whole-stage codegen; scan pushdown for the other columns is unaffected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _nanos_columns(path: str) -> list[str]:
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type).startswith("timestamp[ns")]
    except Exception:
        return []


# (session-id, path) -> DataFrame; DataFrames are immutable plans, so
# reuse avoids re-reading footers when many queries touch the same table
_CACHE: dict[tuple[int, str], DataFrame] = {}


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = (id(spark), path)
    if key in _CACHE:
        return _CACHE[key]
    df = _read_parquet_uncached(spark, path)
    _CACHE[key] = df
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the source has too few splits.

    Small/single-row-group parquet files arrive as one partition, which
    serializes every narrow per-row operator (regex, shingling, UDFs)
    onto one core.  At real scale inputs are already split; this guard
    only pays its (tiny) shuffle when the source under-splits.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def _read_parquet_uncached(spark: SparkSession, path: str) -> DataFrame:
    ns_cols = _nanos_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
        )
    return df
