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
    def _ns(schema) -> list[str]:
        return [f.name for f in schema if str(f.type).startswith("timestamp[ns")]

    # pyarrow.dataset resolves single files AND directory layouts (the
    # common Spark-written shape: part files inside a dir) — pq.read_schema
    # alone only handles single files, which would silently skip the nanos
    # fix for directory tables and restore the PARQUET_TYPE_ILLEGAL crash
    try:
        import pyarrow.dataset as pads

        return _ns(pads.dataset(path, format="parquet").schema)
    except Exception:
        pass
    try:
        import pyarrow.parquet as pq

        return _ns(pq.read_schema(path))
    except Exception:
        return []


# (session-id, path) -> DataFrame; DataFrames are immutable plans, so
# reuse avoids re-reading footers when many queries touch the same table.
# The cached plan captures the file listing at first read: if the files
# under a path are REWRITTEN later, pass refresh=True (or call
# clear_parquet_cache) to re-resolve — appends to a directory are picked
# up either way, since listing happens per query for directory sources.
_CACHE: dict[tuple[int, str], DataFrame] = {}


def read_parquet(spark: SparkSession, path: str, refresh: bool = False) -> DataFrame:
    key = (id(spark), path)
    if refresh:
        _CACHE.pop(key, None)
    if key in _CACHE:
        return _CACHE[key]
    df = _read_parquet_uncached(spark, path)
    _CACHE[key] = df
    return df


def clear_parquet_cache(path: str | None = None) -> None:
    """Drop cached plans — for ``path`` only, or all of them.  Needed
    when files at a cached path were overwritten/deleted (the cached
    plan's file listing would read stale or missing files), and to
    release plans bound to stopped SparkSessions."""
    if path is None:
        _CACHE.clear()
    else:
        for key in [k for k in _CACHE if k[1] == path]:
            _CACHE.pop(key, None)


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
    return df.withColumns(
        {
            c: F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
            for c in ns_cols
        }
    )
