"""Maintained window-function views — affected-partition partial
recompute.

Window functions (running totals, ranks, lead/lag) are not
delta-maintainable value-to-value: one inserted row shifts every later
row's frame in its partition.  But a window computation is PER
PARTITION: no row of an untouched ``PARTITION BY`` key can change.  So
the exact delta region is the partition keys present in the base-table
delta — the same affected-key argument as the as-of join CDC
(operators/asof.py, whose delta rule this generalizes to any windowed
projection):

    ΔV = [ W(σ_affected(T'))  −  W(σ_affected(T)) ]      (bag diff)

with W the windowed projection, σ_affected the null-safe semi join
against the broadcast affected-key set, and the diff via ``exceptAll``
both ways.

Scale shape: the base is only ever NULL-SAFE-semi-joined against the
broadcast affected-key set — never shuffled in full — and the window
recompute runs over the affected partitions only: O(|affected
partitions|) per batch, the pruning a key-bucketed store gives a MERGE
INTO.  Determinism contract: the caller's window ordering must be a
TOTAL order within each partition (include a unique tiebreaker column),
otherwise W itself is nondeterministic and no maintenance scheme — nor
a recompute — produces stable results.  (User-facing statement of this
contract, incl. the duplicate-row caveat for multi-window projections:
README.md "Window-view contract".)

Reference parity note: window functions are outside the reference's
surface (README.md:33-36 — SURVEY.md §2c "window functions: not
incremental; exclude from IVM surface"); this operator closes that
exclusion the same way the engine's other beyond-reference rules do,
with the multiplicity-tagged CDC contract shared by every delta rule.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def window_view_delta(
    table: DataFrame,
    delta: DataFrame,
    partition_cols: tuple[str, ...],
    compute: Callable[[DataFrame], DataFrame],
    mult_col: str = "_duckdb_ivm_multiplicity",
) -> DataFrame:
    """Δ of ``compute(table)`` under ``delta``, confined to the affected
    ``partition_cols`` keys.  ``compute`` maps the (restricted) base
    relation to the windowed projection; it must be partition-local:
    every window it uses partitions by (at least) ``partition_cols``, so
    restricting its input to whole partitions commutes with it.  Returns
    view columns + the bool multiplicity."""
    from ivm_extension_spark.operators.merge import apply_delta_to_table
    from ivm_extension_spark.operators.thetajoin import _ns_join

    keys = list(partition_cols)
    ak = delta.select(*keys).distinct().localCheckpoint(eager=False)
    t_a = _ns_join(table, ak, keys, "leftsemi").localCheckpoint(eager=False)
    t_new = apply_delta_to_table(t_a, delta)
    old = compute(t_a)
    new = compute(t_new)
    ins = new.exceptAll(old).withColumn(mult_col, F.lit(True))
    dels = old.exceptAll(new).withColumn(mult_col, F.lit(False))
    return ins.unionByName(dels)
