"""ViewDef — the engine's tiny logical IR for maintainable views.

The reference stores view definitions as SQL text in DuckDB's catalog and
re-plans them inside the optimizer rule (ivm_rewrite_rule.hpp:316-335).
We keep them structured instead: a ViewDef names the source table(s), the
predicate, the group keys and the aggregate list, with all scalar
expressions held as Spark-SQL expression strings (Catalyst parses them via
``F.expr`` — no custom expression tree needed).

Supported aggregate functions: sum, count, count(*), avg, min, max,
count_distinct, var_pop, var_samp, stddev_pop, stddev_samp. The
reference supports only SUM and COUNT (README.md:35); the rest are the
closure its poster lists as future work.  Variance-family aggregates are
maintained exactly through hidden SUM(x), SUM(x*x), COUNT(x) companions
(all linear, so every delta/merge rule applies unchanged) and recomposed
on read.
"""

from __future__ import annotations

from dataclasses import dataclass

VARIANCE_AGGS = {"var_pop", "var_samp", "stddev_pop", "stddev_samp"}
# Order-statistic aggregates: maintained exactly under deletes from the
# per-(group, value) auxiliary relation (operators/auxstate.py) — never
# combined value-to-value.  MODE ties break to the SMALLEST value
# (Spark's deterministic mode); MEDIAN/PERCENTILE interpolate linearly at
# rank p*(n-1), the ANSI PERCENTILE_CONT rule.
ORDERED_AGGS = {"median", "mode", "percentile"}
SUPPORTED_AGGS = (
    {"sum", "count", "avg", "min", "max", "count_distinct"}
    | {"sum_distinct", "avg_distinct"}
    | VARIANCE_AGGS
    | ORDERED_AGGS
)

# aggregates whose value is a function of the group's distinct-value SET
# (not additive across batches or finer groupings): maintained via the
# per-(group, value) aux relation, like ORDERED_AGGS
DISTINCT_AGGS = {"count_distinct", "sum_distinct", "avg_distinct"}


@dataclass(frozen=True)
class Aggregate:
    """One aggregate in a view's select list, e.g. sum(a+2) AS s."""

    fn: str  # one of SUPPORTED_AGGS
    expr: str  # SQL expression string; "*" only for count
    alias: str
    param: float | None = None  # percentile fraction (percentile only)

    def __post_init__(self) -> None:
        if self.fn not in SUPPORTED_AGGS:
            raise NotImplementedError(
                f"aggregate function {self.fn!r} not supported "
                f"(supported: {sorted(SUPPORTED_AGGS)})"
            )
        if self.expr == "*" and self.fn != "count":
            raise ValueError(f"'*' argument only valid for count, got {self.fn}")
        if self.fn == "percentile":
            if self.param is None or not (0.0 <= self.param <= 1.0):
                raise ValueError(
                    f"percentile needs a fraction in [0, 1], got {self.param!r}"
                )
        elif self.param is not None:
            raise ValueError(f"{self.fn} takes no parameter, got {self.param!r}")

    @property
    def fraction(self) -> float:
        """The percentile fraction (median is percentile 0.5)."""
        return 0.5 if self.fn == "median" else float(self.param)


@dataclass(frozen=True)
class JoinSpec:
    """An INNER, LEFT OUTER, FULL OUTER, SEMI, or ANTI join against
    another registered table.

    ``on`` is a SQL boolean expression over columns of the accumulated
    left side and ``table``.  Inner joins use the three-branch delta
    rule; LEFT/FULL joins additionally maintain the NULL-padded anti
    part(s) with match-count deltas (DBToaster-style counting — see
    operators/rewrite.py).  RIGHT joins are normalized to LEFT by the
    SQL front door, which also lowers ``WHERE [NOT] EXISTS (...)`` and
    ``WHERE x IN (SELECT ...)`` to semi/anti JoinSpecs — the reference
    rejects nested subqueries outright (README.md:36); this is the
    natural closure.  Semi/anti joins emit only the left side's columns.
    """

    table: str
    on: str
    how: str = "inner"

    def __post_init__(self) -> None:
        if self.how not in ("inner", "left", "full", "semi", "anti"):
            raise NotImplementedError(
                "only INNER, LEFT OUTER, FULL OUTER, SEMI, and ANTI joins "
                f"are incrementally maintainable in this engine (got {self.how!r})"
            )


@dataclass(frozen=True)
class ViewDef:
    """A maintainable view: SELECT <select|aggregates> FROM <source>
    [JOIN ...] [WHERE <where>] [GROUP BY <group_by>].

    ``select`` holds the non-aggregate output columns as (expr, alias)
    pairs *in final select order interleaved with aggregates* — to keep
    exact output column order we also record ``output_order``: the list
    of aliases in the order they appear in the original SELECT list.
    """

    name: str
    source: str
    select: tuple[tuple[str, str], ...] = ()  # (expr, alias) non-aggregate items
    aggregates: tuple[Aggregate, ...] = ()
    where: str | None = None
    group_by: tuple[str, ...] = ()  # expressions (usually plain columns)
    joins: tuple[JoinSpec, ...] = ()
    output_order: tuple[str, ...] = ()  # aliases in SELECT-list order
    # HAVING over output aliases/group columns.  Maintained state is always
    # pre-HAVING (a group can cross the threshold in a later batch); the
    # filter is applied when the public view is read (merge.finalize).
    having: str | None = None
    # QUALIFY: a boolean expression over output columns that may contain
    # window functions (``row_number() OVER (PARTITION BY ...) <= N`` —
    # maintained top-N-per-group views).  Like HAVING it is applied when
    # the public view is read: maintained state is always pre-QUALIFY,
    # since deltas move ranks.  (No QUALIFY exists in the reference.)
    qualify: str | None = None
    # SELECT DISTINCT: duplicate elimination is maintained by counting —
    # the select items become group keys and merge.internal_view threads
    # a hidden count(*) so a tuple survives exactly while its multiset
    # count is positive.  (The reference has no DISTINCT support.)
    distinct: bool = False
    # GROUP BY ROLLUP/CUBE/GROUPING SETS: each inner tuple is a subset of
    # the group-key aliases.  The maintained state is ALWAYS the finest
    # grouping (all keys) — every delta/merge rule applies unchanged —
    # and the listed sets are re-aggregated from that state on read
    # (merge.finalize), NULL-padding the rolled-up keys.  The reference
    # only brushes grouping sets defensively (ivm_rewrite_rule.hpp:
    # 237-242, appending its multiplicity key to grouping_sets[0]).
    grouping_sets: tuple[tuple[str, ...], ...] = ()
    # ORDER BY / LIMIT (top-k) — the reference has no ORDER BY/LIMIT in any
    # supported view (SURVEY.md §2c "sorts/limits").  Maintained state is
    # ALWAYS the full pre-limit view: a row can enter or leave the top-k as
    # later deltas move its rank, so the limit is applied when the public
    # view is read (merge.finalize), like HAVING.  Each order_by item is
    # (expression over output aliases, "asc"|"desc").  At scale the read is
    # a per-partition partial top-k (TakeOrderedAndProject), never a global
    # sort — plan-audited in tests/test_plan_audit.py.
    order_by: tuple[tuple[str, str], ...] = ()
    limit: int | None = None
    # Window-function views (round 6): the shared PARTITION BY column
    # list of every OVER clause in the select items.  Window values are
    # not delta-maintainable value-to-value, but they are PARTITION-
    # LOCAL, so the view is maintained by affected-partition partial
    # recompute (operators/windowcdc.py): the delta region is exactly
    # the partitions of these keys present in the base delta.
    window_partition: tuple[str, ...] = ()
    # Multi-list window views (round 8): when the select items use MORE
    # THAN ONE distinct PARTITION BY list, ALL window expressions still
    # compute in ONE projection (select items cannot reference each
    # other's aliases, so there is no stage dependency) and the view is
    # maintained as a single fused unit: the delta region is the UNION
    # of each list's affected partitions, and the recompute input is
    # that region's closure under every list (windowcdc.
    # multi_window_view_delta).  This replaces the round-7 cascade of
    # per-list intermediate IMMVs — one lifecycle per batch instead of
    # one per list.  Holds every distinct PARTITION BY list; mutually
    # exclusive with ``window_partition`` (the single-list fast path).
    window_lists: tuple[tuple[str, ...], ...] = ()
    # Read-windows (round 8): window expressions in the select list of an
    # AGGREGATE view — including GLOBAL windows (no PARTITION BY), e.g.
    # ``rank() OVER (ORDER BY rev DESC)`` over a maintained revenue
    # total.  A rank is not incrementally maintainable (one delta can
    # shift every rank), but over an aggregate view the merged state IS
    # the bounded delta region, so the window is recomputed on READ over
    # the post-HAVING finalized state (merge.finalize) — exactly the
    # finalize-on-read treatment HAVING/QUALIFY get.  Each entry is
    # (window expr over output aliases, alias).  State and ΔV never
    # carry these columns.
    read_windows: tuple[tuple[str, str], ...] = ()
    # Select-list order including read-window aliases (output_order holds
    # the STATE order, which excludes them); empty = output_order.
    public_order: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.window_partition and self.window_lists:
            raise ValueError(
                "pass window_partition (single list) or window_lists "
                "(multi-list fused view), not both"
            )
        if (self.window_partition or self.window_lists) and (
            self.aggregates
            or self.group_by
            or self.distinct
            or self.grouping_sets
            or self.having
            or self.qualify
            or self.joins
            or self.order_by
            or self.limit is not None
        ):
            raise NotImplementedError(
                "window views support only SELECT <exprs with OVER "
                "(PARTITION BY ...)> FROM <table> [WHERE ...] — compose "
                "joins/aggregates/read clauses in a cascaded view"
            )
        if not self.output_order:
            order = [a for _, a in self.select] + [a.alias for a in self.aggregates]
            object.__setattr__(self, "output_order", tuple(order))
        if self.read_windows:
            if not (self.aggregates or self.group_by or self.distinct):
                raise NotImplementedError(
                    "window expressions without a PARTITION BY need a "
                    "bounded delta region: over a raw table none exists — "
                    "either partition the window (maintained by "
                    "affected-partition recompute) or window over a "
                    "maintained AGGREGATE view's output (recomputed on "
                    "read over the merged state)"
                )
            if self.grouping_sets:
                raise NotImplementedError(
                    "read-windows over ROLLUP/CUBE/GROUPING SETS views are "
                    "not supported (apply the window in a cascaded view)"
                )
        if self.distinct and (self.aggregates or self.group_by):
            raise NotImplementedError(
                "SELECT DISTINCT with aggregates or GROUP BY is redundant "
                "or ambiguous — drop DISTINCT (grouping already dedups)"
            )
        if self.grouping_sets:
            keys = {a for _, a in self.select}
            for gs in self.grouping_sets:
                bad = [k for k in gs if k not in keys]
                if bad:
                    raise NotImplementedError(
                        f"grouping set {gs} uses keys {bad} that are not "
                        "plain projected group columns"
                    )
            for a in self.aggregates:
                if a.fn in DISTINCT_AGGS or a.fn in ORDERED_AGGS:
                    raise NotImplementedError(
                        f"{a.fn} cannot be re-aggregated from the finest "
                        "grouping (its value is not additive across groups) "
                        "— rollup/cube views support sum/count/min/max/avg/"
                        "variance"
                    )
        if self.qualify and self.grouping_sets:
            raise NotImplementedError(
                "QUALIFY over ROLLUP/CUBE/GROUPING SETS views is not "
                "supported (apply the rank filter to a cascaded view)"
            )
        if any(a.fn in ORDERED_AGGS for a in self.aggregates) and not self.select:
            raise NotImplementedError(
                "global MEDIAN/MODE/PERCENTILE views are not supported — "
                "add a GROUP BY (the empty-input row cannot be produced by "
                "the aux-relation derive path)"
            )
        if self.limit is not None:
            if not self.order_by:
                raise NotImplementedError(
                    "LIMIT without ORDER BY is nondeterministic — give the "
                    "view a total order (add a unique key to ORDER BY)"
                )
            if self.limit < 0:
                raise ValueError(f"LIMIT must be non-negative, got {self.limit}")
        for _, direction in self.order_by:
            if direction not in ("asc", "desc"):
                raise ValueError(f"ORDER BY direction must be asc/desc, got {direction!r}")

    def to_dict(self) -> dict:
        """JSON-safe representation (see sources/persist.py)."""
        return {
            "name": self.name,
            "source": self.source,
            "select": [list(p) for p in self.select],
            "aggregates": [
                [a.fn, a.expr, a.alias] + ([a.param] if a.param is not None else [])
                for a in self.aggregates
            ],
            "where": self.where,
            "group_by": list(self.group_by),
            "joins": [[j.table, j.on, j.how] for j in self.joins],
            "output_order": list(self.output_order),
            "having": self.having,
            "qualify": self.qualify,
            "distinct": self.distinct,
            "grouping_sets": [list(g) for g in self.grouping_sets],
            "order_by": [list(o) for o in self.order_by],
            "limit": self.limit,
            "window_partition": list(self.window_partition),
            "window_lists": [list(w) for w in self.window_lists],
            "read_windows": [list(p) for p in self.read_windows],
            "public_order": list(self.public_order),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ViewDef":
        return cls(
            name=d["name"],
            source=d["source"],
            select=tuple(tuple(p) for p in d["select"]),
            aggregates=tuple(Aggregate(*a) for a in d["aggregates"]),
            where=d["where"],
            group_by=tuple(d["group_by"]),
            joins=tuple(JoinSpec(*j) for j in d["joins"]),
            output_order=tuple(d["output_order"]),
            # post-v1 fields default when absent so catalogs saved by an
            # earlier build still load (same pattern qualify already used)
            having=d.get("having"),
            qualify=d.get("qualify"),
            distinct=bool(d.get("distinct", False)),
            grouping_sets=tuple(tuple(g) for g in d.get("grouping_sets", ())),
            order_by=tuple(tuple(o) for o in d.get("order_by", ())),
            limit=d.get("limit"),
            window_partition=tuple(d.get("window_partition", ())),
            window_lists=tuple(tuple(w) for w in d.get("window_lists", ())),
            read_windows=tuple(tuple(p) for p in d.get("read_windows", ())),
            public_order=tuple(d.get("public_order", ())),
        )

    @property
    def is_aggregate(self) -> bool:
        return bool(self.aggregates)

    @property
    def tables(self) -> tuple[str, ...]:
        return (self.source, *(j.table for j in self.joins))

    def aggregate_by_alias(self, alias: str) -> Aggregate | None:
        for a in self.aggregates:
            if a.alias == alias:
                return a
        return None
