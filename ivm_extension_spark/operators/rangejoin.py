"""Range (interval) join — point-in-interval, without the cross-join trap.

``left.pt BETWEEN right.lo AND right.hi`` has no equi-key, so Catalyst
falls back to BroadcastNestedLoopJoin: O(|L| x |R|) comparisons.  The
standard fix is binning: quantize the value axis into fixed-width bins,
explode each interval to the bins it overlaps, equi-join points to bins,
then re-check the exact predicate.  Comparisons drop from |L| x |R| to
sum over bins of |L_bin| x |R_bin| — linear for intervals of bounded
width.

Bin width is the knob: ~the median interval width is a good default
(each interval explodes to ~2 bins).  Degenerate giant intervals fatten
one branch; split them (cap via ``max_bins_per_interval`` guard) or
route them through the broadcast fallback.

At 100 TB: the binned join is a plain shuffle/broadcast hash join on
(key?, bin) — all of Spark's join machinery (AQE, skew splitting)
applies; nothing here is local-mode specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BIN = "__rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    key_cols: tuple[str, ...] = (),
    max_bins_per_interval: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= pt <= hi`` (and equal ``key_cols``, if given).

    Output: all point columns + all interval columns.  ``bin_width`` is
    in the units of ``point_col`` (for timestamps, cast to epoch seconds
    first or pass numeric columns).  ``how`` supports 'inner' and
    'left' (left keeps pointless rows with NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = (set(points.columns) & set(intervals.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            f"non-key column names must be disjoint, both sides have {sorted(overlap)}"
        )
    p = points.withColumn(
        _BIN, F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.least(
                    F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
                    F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long")
                    + F.lit(max_bins_per_interval),
                ),
            )
        ),
    )
    joined = p.join(i, on=[_BIN, *key_cols], how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    out_cols = [c for c in points.columns] + [
        c for c in intervals.columns if c not in (*key_cols,)
    ]
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # left: anti-join the unmatched points back in with NULL intervals
    unmatched = points.join(
        matched.select(*points.columns).distinct(), on=points.columns, how="left_anti"
    )
    for c in intervals.columns:
        if c not in key_cols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType)
            )
    return matched.unionByName(unmatched.select(*out_cols))
