"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row, attach the latest right row with ``right.ts <=
left.ts`` per key (the time-series "last known value" join: trades →
quotes, events → dimension snapshots).

Spark-first implementation: the classical union trick instead of a
range join —

  1. tag left rows (is_left=1) and right rows (is_left=0),
  2. union them on the key/timestamp axis (ONE shuffle, on the key),
  3. per key, ordered by (ts, is_left) — right rows sort before left
     rows at equal timestamps, so ties resolve to "at or before" —
     carry the last non-null right payload forward with
     ``last(..., ignorenulls=True)`` over an unbounded-preceding frame
     (the payload is ONE struct so every carried field comes from the
     same matched right row, even when some right fields are NULL),
  4. keep the left rows.

Cost: one shuffle of |L| + |R| rows on the key, then a per-partition
sort — same asymptotics as a co-partitioned merge join, with no
O(|L| x |R|) range-join blowup.  At 100 TB both sides would be stored
bucketed by the key so even that single exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_IS_LEFT = "__asof_is_left"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str,
    value_cols: tuple[str, ...],
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right
    ``value_cols`` (and the matched right timestamp as
    ``right_ts_alias``) where ``right.ts_col <= left.ts_col`` on the
    same key; NULLs when no right row precedes the left row.

    ``right`` must be unique per (key, ts) — pre-aggregate it otherwise
    (a duplicate would make "the" as-of value ambiguous).
    """
    keys = list(key_cols)
    lcols = left.columns
    # output columns must not collide with left's (two same-named
    # columns would make every downstream reference ambiguous — same
    # validation as range_join)
    clashes = (set(value_cols) | {right_ts_alias}) & set(lcols)
    if clashes:
        raise ValueError(
            f"value_cols/right_ts_alias collide with left columns: {sorted(clashes)}"
        )
    # a NULL right timestamp satisfies no `right.ts <= left.ts`
    # predicate, but asc ordering sorts NULLS FIRST — unfiltered it
    # would be carried as a phantom as-of match for rows with no true
    # predecessor
    right = right.filter(F.col(ts_col).isNotNull())
    payload = F.struct(
        *[F.col(v).alias(v) for v in value_cols], F.col(ts_col).alias("__ts")
    )

    l = left.withColumn(_IS_LEFT, F.lit(1)).withColumn(
        _PAYLOAD,
        F.lit(None).cast(
            "struct<"
            + ",".join(
                [f"{v}:{right.schema[v].dataType.simpleString()}" for v in value_cols]
                + [f"__ts:{right.schema[ts_col].dataType.simpleString()}"]
            )
            + ">"
        ),
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.lit(0).alias(_IS_LEFT),
        payload.alias(_PAYLOAD),
    )
    for c in lcols:
        if c not in (*keys, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(_IS_LEFT).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col(_IS_LEFT),
        F.last(F.col(_PAYLOAD), ignorenulls=True).over(w).alias("__c"),
    )
    return carried.filter(F.col(_IS_LEFT) == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__c.{v}").alias(v) for v in value_cols],
        F.col("__c.__ts").alias(right_ts_alias),
    )
