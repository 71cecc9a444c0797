"""Time-series bucketing and gap-fill (hypertable-rollup style).

Semantics follow the public TimescaleDB ``time_bucket_gapfill`` +
``locf``/``interpolate`` surface (re-expressed Spark-first, no code
relation): observations are bucketed to a fixed step, and every missing
bucket between a key's first and last observation is emitted with its
value filled by carry-forward (``locf``), linear interpolation between
the surrounding observations (``linear``), or left NULL (``null``).

Reference scope note: cwida/ivm-extension has no time-series surface
(README.md:33-36 — filter/projection/group-by only); this module is part
of the training-data-pipeline extension surface, like text/dedup.

Scale design — the whole fill is TWO shuffles and NO join:

1. ``bucket_resample`` is one hash aggregate on (keys, bucket) with
   map-side partial aggregation (sums/counts combine before the
   exchange).
2. ``gap_fill`` generates missing buckets from their PREDECESSOR row:
   one window over the bucketed aggregate (partitioned by key — the
   second shuffle) computes each row's successor bucket via ``lead``,
   then a JVM-side ``sequence``/``posexplode`` emits the row's own
   bucket plus every gap bucket strictly before the successor.  Each
   missing bucket is produced exactly once, adjacent to the observation
   that fills it — so LOCF is an expression on the exploded row (no
   second window pass), and linear interpolation only needs the already
   ``lead``-ed next value.  Nothing materializes a dense grid to join
   against: at 100 TB the cost is O(observations + emitted gaps),
   partitioned by key, and a pathological key with a huge silent span
   emits its gap run from one task but never shuffles it.

All fill arithmetic is closed-form over the aggregated values, so an
oracle engine recomputes it bit-for-bit: integer aggregates stay exact,
and ``linear`` evaluates the same IEEE expression shape
``v + (nv - v) * (gb - b) / (nb - b)`` both sides.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

FILL_METHODS = ("locf", "linear", "null")


def time_bucket(time_col: str | Column, step_seconds: int) -> Column:
    """Epoch-second bucket start: floor(epoch(ts) / step) * step, as a
    BIGINT — a true FLOOR (a cast would truncate toward zero and put
    pre-1970 timestamps in a bucket that starts after them; TimescaleDB
    time_bucket floors).  Exact: |epoch/step| stays far under 2^53, so
    the double division loses nothing before the floor."""
    col = F.col(time_col) if isinstance(time_col, str) else time_col
    step = int(step_seconds)
    return F.floor(F.unix_timestamp(col) / F.lit(step)).cast("long") * F.lit(step)


def bucket_resample(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    step_seconds: int,
    aggs: Mapping[str, Column],
) -> DataFrame:
    """One row per (keys, bucket) with the given aggregate expressions —
    a single hash aggregate; Catalyst plants the map-side partial."""
    bucket = time_bucket(time_col, step_seconds).alias("bucket")
    return df.groupBy(*keys, bucket).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def gap_fill(
    bucketed: DataFrame,
    keys: Sequence[str],
    step_seconds: int,
    value_cols: Mapping[str, str],
    bucket_col: str = "bucket",
    emit_is_gap: bool = True,
) -> DataFrame:
    """Densify each key's bucket range, filling ``value_cols`` (a
    {column: method} map, methods per FILL_METHODS).  Emits one row per
    bucket in [min(bucket), max(bucket)] per key; ``is_gap`` marks the
    generated rows.  Gap rows' ``null``-method columns are NULL; locf
    columns carry the anchor row's value; linear columns interpolate
    toward the ``lead`` row (exact-edge: the last observed bucket of a
    key never interpolates — there is no successor, and no gap rows
    follow it)."""
    bad = [m for m in value_cols.values() if m not in FILL_METHODS]
    if bad:
        raise ValueError(f"unknown fill methods {bad}; pick from {FILL_METHODS}")
    step = int(step_seconds)
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    nxt = F.lead(bucket_col).over(w)
    cur = bucketed.withColumn("_nb", nxt).select(
        *keys,
        F.col(bucket_col).alias("_b"),
        "_nb",
        *[F.col(c) for c in value_cols],
        *[
            F.lead(c).over(w).alias(f"_nv_{c}")
            for c, m in value_cols.items()
            if m == "linear"
        ],
    )
    # the row's own bucket plus every missing grid point strictly before
    # its successor; the per-key last row (no successor) emits only
    # itself.  The stop is the LARGEST grid point below _nb — not
    # `_nb - step` — so inputs whose spacing is not an exact multiple of
    # step (irregular buckets, or a step coarser than the data) emit a
    # well-formed grid instead of crashing sequence() with a stop below
    # its start; greatest() covers a successor closer than one step
    # (no gap to fill)
    stop = F.greatest(
        F.col("_b")
        + F.floor((F.col("_nb") - F.col("_b") - 1) / F.lit(step)).cast("long")
        * F.lit(step),
        F.col("_b"),
    )
    grid = F.sequence(F.col("_b"), F.coalesce(stop, F.col("_b")), F.lit(step))
    exploded = cur.select(
        *keys,
        "_b",
        "_nb",
        *[c for c in cur.columns if c.startswith("_nv_")],
        *value_cols,
        F.explode(grid).alias(bucket_col),
    )
    is_gap = F.col(bucket_col) != F.col("_b")
    out_vals = []
    for c, m in value_cols.items():
        if m == "locf":
            out_vals.append(F.col(c).alias(c))  # anchor value carries forward
        elif m == "null":
            out_vals.append(F.when(~is_gap, F.col(c)).alias(c))
        else:  # linear — same IEEE expression shape as the SQL oracle
            v = F.col(c).cast("double")
            nv = F.col(f"_nv_{c}").cast("double")
            frac = (F.col(bucket_col) - F.col("_b")).cast("double") / (
                F.col("_nb") - F.col("_b")
            ).cast("double")
            out_vals.append(
                F.when(~is_gap, v).otherwise(v + (nv - v) * frac).alias(c)
            )
    extra = [is_gap.alias("is_gap")] if emit_is_gap else []
    return exploded.select(*keys, F.col(bucket_col), *out_vals, *extra)
