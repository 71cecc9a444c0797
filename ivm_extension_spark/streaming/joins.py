"""Stream-stream interval join.

Spark's Structured Streaming can join two live streams when both sides
are watermarked and the join condition bounds the two event times
against each other — the engine buffers each side in the state store
and prunes rows once the watermark passes the interval bound, so state
stays O(rate × interval), never O(stream).  This module wraps that
pattern (the canonical "click→purchase attribution" shape) with the
column bookkeeping done once.

The same plan runs on batch DataFrames — the time-range predicate sits
on top of an ordinary equi-join on the key, so Catalyst plans a hash
or sort-merge join on the key with the range as a post-join filter
(never a nested loop when ``key_cols`` is non-empty).

At 100 TB: the streaming path's state requirements are bounded by the
watermark delay + interval width per key; the batch path shuffles both
sides once on the key.  Skewed keys fall back to the usual salting
utilities (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    left_ts: str,
    right_ts: str,
    upper: str = "30 minutes",
    lower: str = "0 seconds",
    watermark: str = "1 hour",
) -> DataFrame:
    """INNER join of ``left`` and ``right`` on key equality plus
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Column names (other than ``key_cols``) must be disjoint.  When both
    inputs are streaming, both get ``withWatermark`` (required by Spark
    for state cleanup in stream-stream joins); the time-range condition
    lets the engine drop buffered rows once the watermark passes
    ``left_ts + upper``.  On batch inputs the watermark call is skipped
    and the identical condition plans as an equi-join + filter.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"non-key column names must be disjoint, both sides have {sorted(overlap)}"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{right_ts} >= {left_ts} + INTERVAL {lower} AND "
        f"{right_ts} <= {left_ts} + INTERVAL {upper}"
    )
    for k in key_cols:
        cond = cond & (left[k] == right[k])
    out_cols = [
        *[left[k].alias(k) for k in key_cols],
        *[left[c] for c in left.columns if c not in key_cols],
        *[right[c] for c in right.columns if c not in key_cols],
    ]
    return left.join(right, on=cond, how="inner").select(*out_cols)
