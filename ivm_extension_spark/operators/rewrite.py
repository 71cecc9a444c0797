"""The IVM rewrite: turn a ViewDef into its delta plan (a DataFrame).

This is the Spark-first re-expression of the reference's whole core
(ivm_rewrite_rule.hpp:28-359, a DuckDB optimizer-extension that edits the
optimized logical plan node-by-node).  We never touch plans: the delta
query is *declared* with DataFrame operations and Catalyst does predicate
pushdown / column pruning / physical planning (SURVEY.md section 4 —
zero custom rules needed).

Node-for-node parity with the reference rewrite:

- scan swap  (ivm_rewrite_rule.hpp:100-220): read ``delta_<table>``
  instead of the base table; hard error if the delta is missing
  (reference behavior at :110-116).  Filter/column pushdown onto the
  delta scan (:140, :150-205) is Catalyst's job — free.
- filter     (:277-281): applied unchanged — the delta rule for
  selection is the identity.
- projection (:254-276): multiplicity column selected through.
- aggregate  (:221-253): ``_duckdb_ivm_multiplicity`` added as an extra
  group key so inserts and deletes aggregate into separate groups;
  aggregate functions run unchanged over the delta rows.
- top node   (:62-87): multiplicity appended as the last output column.

Beyond the reference (its poster's "future work"): the inner-join delta
rule  Δ(L ⋈ R) = ΔL⋈R  ∪  L⋈ΔR  ∪  ΔL⋈ΔR  generalized to n tables
(every non-empty subset of delta substitutions), with signed weights
multiplied across sides.  Delta sides are broadcast by default — at
scale ΔT is small relative to T, so every branch becomes a broadcast
hash join and the 100-TB base table is only ever scanned, never
shuffled.
"""

from __future__ import annotations

from itertools import product
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ivm_extension_spark.plans.viewdef import Aggregate, ViewDef

MULT_COL = "_duckdb_ivm_multiplicity"
_SIGN = "__ivm_sign"


class IVMError(RuntimeError):
    """Engine-level error (missing delta table, unsupported shape, ...)."""


def _agg_expr(agg: Aggregate):
    e = F.expr(agg.expr) if agg.expr != "*" else None
    if agg.fn == "sum":
        out = F.sum(e)
    elif agg.fn == "count":
        out = F.count(F.lit(1)) if e is None else F.count(e)
    elif agg.fn == "avg":
        out = F.avg(e)
    elif agg.fn == "min":
        out = F.min(e)
    elif agg.fn == "max":
        out = F.max(e)
    elif agg.fn == "count_distinct":
        out = F.count_distinct(e)
    else:  # pragma: no cover - guarded by Aggregate.__post_init__
        raise NotImplementedError(agg.fn)
    return out.alias(agg.alias)


def _signed_delta(delta: DataFrame, sign_col: str) -> DataFrame:
    """delta table (bool multiplicity) -> signed weight column, bool dropped.

    Internally the engine works with signed weights (+1 insert / -1
    delete); the bool survives only at the API surface (SURVEY.md
    section 1.4 mapping table).
    """
    return delta.withColumn(
        sign_col, F.when(F.col(MULT_COL), F.lit(1)).otherwise(F.lit(-1))
    ).drop(MULT_COL)


def _delta_source(
    view: ViewDef,
    get_table: Callable[[str], DataFrame],
    get_delta: Callable[[str], DataFrame],
    broadcast_deltas: bool,
) -> DataFrame:
    """Build the delta source relation with a single ``__ivm_sign`` column.

    Single table: the delta scan itself.  Joins: union of all branches
    where at least one side is a delta (up to 2^n - 1 branches for n
    tables).  A joined table with no registered delta is simply
    unchanged (Δ=∅): every branch marking it delta is empty and is
    skipped — so a fact⋈dim⋈dim view with a delta only on the fact
    table generates exactly one branch.  If NO table has a delta the
    hard error mirrors the reference (ivm_rewrite_rule.hpp:110-116).
    """
    tables = view.tables
    if len(tables) == 1:
        return _signed_delta(get_delta(tables[0]), _SIGN)

    def _has_delta(t: str) -> bool:
        try:
            get_delta(t)
            return True
        except IVMError:
            return False

    with_delta = {t for t in tables if _has_delta(t)}
    if not with_delta:
        get_delta(tables[0])  # re-raise the reference's missing-delta error

    branches: list[DataFrame] = []
    for combo in product((False, True), repeat=len(tables)):
        if not any(combo):
            continue  # the all-base branch is V itself, not part of ΔV
        if any(is_d and t not in with_delta for t, is_d in zip(tables, combo)):
            continue  # Δ=∅ for a deltaless table: the branch is empty
        sides: list[DataFrame] = []
        for tname, is_delta in zip(tables, combo):
            # alias each side with its table name so join conditions may
            # use qualified columns (f.k = d1.k) when names collide
            if is_delta:
                d = _signed_delta(get_delta(tname), f"__w_{tname}").alias(tname)
                sides.append(F.broadcast(d) if broadcast_deltas else d)
            else:
                sides.append(
                    get_table(tname).withColumn(f"__w_{tname}", F.lit(1)).alias(tname)
                )
        acc = sides[0]
        for join, side in zip(view.joins, sides[1:]):
            acc = acc.join(side, on=F.expr(join.on), how="inner")
        sign = F.lit(1)
        for tname in tables:
            sign = sign * F.col(f"__w_{tname}")
        acc = acc.withColumn(_SIGN, sign).drop(*[f"__w_{t}" for t in tables])
        branches.append(acc)
    out = branches[0]
    for b in branches[1:]:
        # positional union: every branch is built with the identical
        # column order (same table order, same per-side projections), and
        # unlike unionByName it tolerates join columns that share a name
        # across tables (f.k = d.k) — a name-keyed union would reject the
        # duplicate column outright
        out = out.union(b)
    return out


def _group_cols(view: ViewDef):
    """Grouping columns: the select list's non-aggregate items, plus any
    GROUP BY expression not already covered by a select item (grouped but
    not projected — legal SQL, the extra key simply isn't output)."""
    cols = [F.expr(e).alias(a) for e, a in view.select]
    covered = {e.strip().lower() for e, _ in view.select} | {
        a.strip().lower() for _, a in view.select
    }
    for g in view.group_by:
        if g.strip().lower() not in covered:
            cols.append(F.expr(g).alias(g))
    return cols


def delta_plan(
    view: ViewDef,
    get_table: Callable[[str], DataFrame],
    get_delta: Callable[[str], DataFrame],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Compute ΔV: the incremental change to ``view`` given the current
    delta tables.  Output schema: view columns in select order +
    ``_duckdb_ivm_multiplicity`` boolean last (ivm_extension.cpp:79-81).

    Aggregate views return one row per (group keys x multiplicity value
    present) — inserts and deletes are aggregated separately, exactly the
    reference's golden behavior (tests/ivm.test:76-82, SURVEY.md 2d).
    """
    src = _delta_source(view, get_table, get_delta, broadcast_deltas)
    src = src.withColumn(MULT_COL, F.col(_SIGN) > 0).drop(_SIGN)

    if view.where:
        src = src.filter(F.expr(view.where))

    if view.is_aggregate:
        keys = _group_cols(view)
        grouped = src.groupBy(*keys, F.col(MULT_COL))
        aggs = [_agg_expr(a) for a in view.aggregates]
        out = grouped.agg(*aggs)
    else:
        cols = [F.expr(e).alias(a) for e, a in view.select]
        out = src.select(*cols, F.col(MULT_COL))

    return out.select(*[F.col(a) for a in view.output_order], F.col(MULT_COL))


def compute_view(
    view: ViewDef,
    get_table: Callable[[str], DataFrame],
) -> DataFrame:
    """Run the view query over the base tables (no deltas) — used for the
    initial materialization of V and for full-refresh / invariant checks."""
    acc = get_table(view.source).alias(view.source)
    for join in view.joins:
        acc = acc.join(
            get_table(join.table).alias(join.table), on=F.expr(join.on), how="inner"
        )
    if view.where:
        acc = acc.filter(F.expr(view.where))
    if view.is_aggregate:
        out = acc.groupBy(*_group_cols(view)).agg(*[_agg_expr(a) for a in view.aggregates])
    else:
        out = acc.select(*[F.expr(e).alias(a) for e, a in view.select])
    return out.select(*[F.col(a) for a in view.output_order])
