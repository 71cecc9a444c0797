"""Auxiliary per-(group, value) state: MIN/MAX/COUNT(DISTINCT) under deletes.

The reference's poster defers MIN/MAX maintenance ("Future Work" panel)
because a delete of the current extreme requires knowing the runner-up.
The classical fix (DBToaster / DBSP "reduction with retractions") is to
maintain, per aggregate, a small auxiliary relation

    aux[alias] = (group keys..., __ivm_value, __ivm_vcnt)

holding the signed multiset of the aggregate's input values per group.
Then after any batch of inserts AND deletes:

    MIN(e)            = min(__ivm_value)   over aux rows with vcnt > 0
    MAX(e)            = max(__ivm_value)
    COUNT(DISTINCT e) = count(*)           (one aux row per live value)

Everything is plain DataFrame algebra — no driver loops, no Python UDFs:

- aux maintenance is ONE shuffle on (keys, value); map-side partial
  aggregation compresses duplicate values before the exchange.
- re-derivation is ONE shuffle on the view keys, output O(|groups|).
- the merge patch joins re-derived values onto the merged state; the
  re-derived side is O(|groups|) so Spark broadcasts it under AQE.

At 100 TB the aux relation is O(distinct (group, value)) — bounded by the
base relation, usually far smaller; it would live as a key-bucketed
lakehouse table so the per-batch union+re-aggregate is co-partitioned.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ivm_extension_spark.operators.rewrite import (
    _SIGN,
    _delta_source,
    _group_cols,
)
from ivm_extension_spark.plans.viewdef import Aggregate, ViewDef

AUX_FNS = {"min", "max", "count_distinct"}
VALUE_COL = "__ivm_value"
VCNT_COL = "__ivm_vcnt"


def aux_aggregates(view: ViewDef) -> list[Aggregate]:
    """The aggregates of ``view`` that need value-level state to survive
    deletes."""
    return [a for a in view.aggregates if a.fn in AUX_FNS]


def init_aux(
    view: ViewDef, agg: Aggregate, get_table: Callable[[str], DataFrame]
) -> DataFrame:
    """Initial aux state from the base tables: the value multiset of
    ``agg.expr`` per group."""
    acc = get_table(view.source).alias(view.source)
    for join in view.joins:
        acc = acc.join(
            get_table(join.table).alias(join.table), on=F.expr(join.on), how="inner"
        )
    if view.where:
        acc = acc.filter(F.expr(view.where))
    keys = _group_cols(view)
    return (
        acc.groupBy(*keys, F.expr(agg.expr).alias(VALUE_COL))
        .agg(F.count(F.lit(1)).alias(VCNT_COL))
    )


def delta_aux(
    view: ViewDef,
    agg: Aggregate,
    get_table: Callable[[str], DataFrame],
    get_delta: Callable[[str], DataFrame],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Signed change to the aux multiset from the current delta tables."""
    src = _delta_source(view, get_table, get_delta, broadcast_deltas)
    if view.where:
        src = src.filter(F.expr(view.where))
    keys = _group_cols(view)
    return (
        src.groupBy(*keys, F.expr(agg.expr).alias(VALUE_COL))
        .agg(F.sum(F.col(_SIGN)).cast("long").alias(VCNT_COL))
    )


def merge_aux(state_aux: DataFrame, delta_aux_df: DataFrame) -> DataFrame:
    """aux' = aux ⊎ Δaux: union + re-count, dead values dropped."""
    key_cols = [c for c in state_aux.columns if c != VCNT_COL]
    return (
        state_aux.unionByName(delta_aux_df)
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum(VCNT_COL).cast("long").alias(VCNT_COL))
        .filter(F.col(VCNT_COL) > 0)
    )


def derive_from_aux(view: ViewDef, agg: Aggregate, aux: DataFrame) -> DataFrame:
    """Re-derive the aggregate's exact value per group from live aux rows.

    Output: (group key aliases..., <agg.alias>).  Groups with no live
    values simply don't appear (their view row is gone anyway).
    """
    keys = [c for c in aux.columns if c not in (VALUE_COL, VCNT_COL)]
    if agg.fn == "min":
        m = F.min(VALUE_COL)
    elif agg.fn == "max":
        m = F.max(VALUE_COL)
    elif agg.fn == "count_distinct":
        # one aux row per live value; count(VALUE_COL) skips a NULL-value row
        m = F.count(F.col(VALUE_COL)).cast("long")
    else:  # pragma: no cover
        raise NotImplementedError(agg.fn)
    return aux.groupBy(*[F.col(k) for k in keys]).agg(m.alias(agg.alias))


def patch_merged(
    merged: DataFrame, view: ViewDef, derived: dict[str, DataFrame]
) -> DataFrame:
    """Overwrite the named aggregate columns of the merged view state with
    their exact re-derived values (join on the group keys; for global
    aggregates the re-derived frame is a single row, cross-joined)."""
    if not derived:
        return merged
    out = merged
    for alias, d in derived.items():
        patched = f"__ivm_patch_{alias}"
        d = d.withColumnRenamed(alias, patched)
        keys = [c for c in d.columns if c != patched]
        missing = [k for k in keys if k not in merged.columns]
        if missing:
            from ivm_extension_spark.operators.rewrite import IVMError

            raise IVMError(
                f"cannot patch {alias!r}: group keys {missing} are not "
                "projected by the view (unprojected GROUP BY keys are not "
                "supported for MIN/MAX/COUNT DISTINCT merge under deletes)"
            )
        if keys:
            out = out.join(F.broadcast(d), on=keys, how="left")
        else:
            out = out.crossJoin(F.broadcast(d))
        out = out.withColumn(alias, F.col(patched)).drop(patched)
    return out.select(*merged.columns)
