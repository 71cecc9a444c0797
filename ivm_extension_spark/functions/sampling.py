"""Deterministic sampling / data-mixing operators for training pipelines.

Beyond-reference surface (the reference, cwida/ivm-extension, has no
sampling support — README.md:33-36 limits it to SELECT/WHERE/GROUP BY);
these are the corpus-curation steps a 100-TB pipeline runs between dedup
and tokenization: down-sample a stratum (per-language / per-source
rates), cap a stratum's contribution (quota), and audit the length
distribution that feeds batch packing.

Design for scale:

- Sampling is a NARROW filter on a deterministic hash bucket — no
  shuffle, no RNG state, pushes through Catalyst to the scan, and the
  same row always lands in the same bucket so re-runs (and the DuckDB
  oracle) agree bit-for-bit.  Rates are expressed in buckets-of-1000
  (per-mille) rather than floats so engine float rounding can't flip a
  boundary row.
- The hash is the first 8 hex chars of md5(id) — portable across Spark
  and standard SQL engines, unlike engine-native hash()/xxhash64 whose
  seeds differ.  md5 is ~100ns/row; at 100 TB the filter is still
  scan-bound, and a persisted pipeline would precompute the bucket once
  as a stored column.
- Quota (top-N per stratum) is ONE shuffle on the stratum key; Spark's
  WindowGroupLimit pushes the N-limit into the partial sort on the map
  side, so only O(N · strata) rows cross the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

BUCKETS = 1000


def bucket_sql(expr: str) -> str:
    """Spark-SQL text of the deterministic per-mille bucket of ``expr``."""
    return (
        f"CAST(conv(substring(md5(CAST({expr} AS STRING)), 1, 8), 16, 10) "
        f"AS BIGINT) % {BUCKETS}"
    )


def oracle_bucket_sql(expr: str) -> str:
    """The same bucket in portable/DuckDB SQL (hex literal cast)."""
    return (
        f"CAST(CONCAT('0x', substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {BUCKETS}"
    )


def hash_bucket(expr: str) -> Column:
    """Deterministic bucket in [0, 1000) from a row identifier."""
    return F.expr(bucket_sql(expr))


def uniform_sample(df: DataFrame, id_expr: str, keep_per_mille: int) -> DataFrame:
    """Keep ~keep_per_mille/1000 of rows, deterministically by id hash.
    Narrow (no shuffle); idempotent across runs and engines."""
    return df.filter(hash_bucket(id_expr) < keep_per_mille)


def stratified_sample(
    df: DataFrame,
    id_expr: str,
    strata_col: str,
    rates_per_mille: dict[str, int],
    default_per_mille: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps
    rates_per_mille[s]/1000 of its rows (default: keep all).  Still a
    single narrow filter — the rate lookup is a CASE expression, so no
    join and no shuffle regardless of the number of strata."""
    rate = F.lit(default_per_mille)
    for value, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(int(r))).otherwise(rate)
    return df.filter(hash_bucket(id_expr) < rate)


def weighted_sample(
    df: DataFrame, id_expr: str, weight_per_mille: Column | str
) -> DataFrame:
    """Per-row weighted deterministic sampling: each row survives with
    probability ``weight/1000`` where the weight is any per-row integer
    expression in [0, 1000] — a quality score, a source prior, a
    recency decay.  The pipeline use is quality-weighted corpus
    downsampling (keep high-quality documents with probability ~1,
    boilerplate with ~0.1): rows with weight >= 1000 always survive,
    weight <= 0 never.  Same shape as the other samplers: one NARROW
    deterministic filter — no shuffle, no RNG state, the same row makes
    the same decision across runs and engines (the hash is md5-based,
    reproducible in the DuckDB oracle via :func:`oracle_bucket_sql`)."""
    w = (
        F.expr(weight_per_mille)
        if isinstance(weight_per_mille, str)
        else weight_per_mille
    )
    return df.filter(hash_bucket(id_expr) < w)


def quota_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    n: int,
) -> DataFrame:
    """Cap each group's contribution at its n best rows (data-mixing
    quota).  ``order_by`` must be a total order (include a unique id as
    the last key) so results are deterministic."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__ivm_rank", F.row_number().over(w))
        .filter(F.col("__ivm_rank") <= n)
        .drop("__ivm_rank")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: Column,
    budget: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Concatenation packing: assign each document to a fixed-token-budget
    training pack.

    Documents are laid out in deterministic ``id_col`` order (within each
    group) as one concatenated token stream split at ``budget``
    boundaries; a document belongs to the pack where its START offset
    falls — the standard concat-and-split packing of LLM pre-training
    pipelines (a straddling document spills into the next pack at the
    cut).  Output: (group_cols..., id, n_tokens, start_offset, pack_id).

    Deterministic and SQL-expressible (one running-sum window), so an
    oracle engine reproduces it exactly.  Scale shape: ONE shuffle+sort
    per group partition; at 100 TB pack within source shards
    (group_cols = (source, shard)) so no single partition holds the whole
    corpus — pack ids are then local to a shard, which is what the
    training loader wants anyway."""
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = tokens_col.cast("bigint")
    start = (F.sum(n).over(w) - n).alias("start_offset")
    return df.select(
        *[F.col(c) for c in group_cols],
        F.col(id_col),
        n.alias("n_tokens"),
        start,
        F.floor((F.sum(n).over(w) - n) / F.lit(budget)).cast("bigint").alias("pack_id"),
    )


def length_histogram(
    df: DataFrame, length_col: Column, bucket_width: int
) -> DataFrame:
    """Distribution of a per-row length measure in fixed-width buckets:
    (bucket_lo, n_docs, total_len).  One map-side-combined aggregation;
    output is O(max_len / width) rows regardless of input size."""
    b = (length_col / bucket_width).cast("bigint") * bucket_width
    return (
        df.select(b.alias("bucket_lo"), length_col.alias("__len"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").cast("bigint").alias("total_len"),
        )
    )
