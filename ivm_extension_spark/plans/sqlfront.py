"""Restricted-SQL front door: parse the reference's supported grammar into a ViewDef.

The reference's live path never parses SQL itself — it re-plans catalog
view text with DuckDB's parser (ivm_rewrite_rule.hpp:329-335); its
regex-based parser extension is dead code (ivm_parser_helpers.cpp:7-60).
We support the same user-facing surface with a small tokenizer-free
clause splitter over the restricted grammar:

    SELECT <item, ...> FROM <table> [JOIN <table> ON <cond>]*
        [WHERE <pred>] [GROUP BY <expr, ...>]

Scalar expressions are NOT interpreted here — they are carried verbatim
into the ViewDef and handed to Catalyst via ``F.expr`` (and, for the
oracle, to DuckDB verbatim), which keeps the supported scalar-function
surface as wide as Spark SQL itself.
"""

from __future__ import annotations

import re

from ivm_extension_spark.plans.viewdef import Aggregate, JoinSpec, ViewDef

_AGG_RE = re.compile(
    r"^\s*(sum|count|avg|min|max|var_pop|var_samp|stddev_pop|stddev_samp|stddev|variance"
    r"|median|mode|percentile)"
    r"\s*\(\s*(.*)\s*\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# ANSI spellings: VARIANCE/STDDEV are the sample variants
_AGG_CANON = {"variance": "var_samp", "stddev": "stddev_samp"}
_ALIAS_RE = re.compile(r"^(.*?)\s+as\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", re.IGNORECASE | re.DOTALL)


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0."""
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    cur: list[str] = []
    for ch in s:
        if quote:
            if ch == quote:
                quote = None
            cur.append(ch)
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _find_clause_spans(sql: str) -> dict[str, str]:
    """Locate top-level SELECT/FROM/WHERE/GROUP BY clause bodies."""
    markers = [
        ("select", re.compile(r"\bselect\b", re.IGNORECASE)),
        ("from", re.compile(r"\bfrom\b", re.IGNORECASE)),
        ("where", re.compile(r"\bwhere\b", re.IGNORECASE)),
        ("group_by", re.compile(r"\bgroup\s+by\b", re.IGNORECASE)),
        ("having", re.compile(r"\bhaving\b", re.IGNORECASE)),
        ("qualify", re.compile(r"\bqualify\b", re.IGNORECASE)),
        ("order_by", re.compile(r"\border\s+by\b", re.IGNORECASE)),
        ("limit", re.compile(r"\blimit\b", re.IGNORECASE)),
    ]
    # find top-level (depth-0, unquoted) positions
    found: list[tuple[int, int, str]] = []  # (start, end_of_kw, name)
    depth = 0
    quote: str | None = None
    i = 0
    while i < len(sql):
        ch = sql[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            for name, rx in markers:
                m = rx.match(sql, i)
                if m and (i == 0 or not sql[i - 1].isalnum() and sql[i - 1] != "_"):
                    found.append((i, m.end(), name))
                    i = m.end()
                    break
            else:
                i += 1
                continue
            continue
        i += 1
    spans: dict[str, str] = {}
    for idx, (start, kw_end, name) in enumerate(found):
        body_end = found[idx + 1][0] if idx + 1 < len(found) else len(sql)
        spans[name] = sql[kw_end:body_end].strip()
    return spans


def _split_top_level_kw(s: str, kw_pattern: str) -> list[str]:
    """Split on a keyword regex at paren/quote depth 0 (e.g. ``\\bAND\\b``)."""
    rx = re.compile(kw_pattern, re.IGNORECASE)
    parts: list[str] = []
    depth = 0
    quote: str | None = None
    i = last = 0
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = rx.match(s, i)
            if m and m.end() > i:
                parts.append(s[last:i])
                last = i = m.end()
                continue
        i += 1
    parts.append(s[last:])
    return [p.strip() for p in parts if p.strip()]


def _split_conjuncts(s: str) -> list[str]:
    """Split a WHERE body into top-level AND conjuncts — only where that
    preserves semantics:

    - a depth-0 ``OR`` means AND is NOT the top-level operator (it binds
      tighter), so the whole clause is returned as one conjunct;
    - ``BETWEEN lo AND hi``'s AND is part of the BETWEEN, not a split
      point;
    - ``CASE ... END`` bodies are opaque (their WHENs may contain AND).
    """
    rx = {
        k: re.compile(rf"\b{k}\b", re.IGNORECASE)
        for k in ("AND", "OR", "BETWEEN", "CASE", "END")
    }
    parts: list[str] = []
    depth = case_depth = between = 0
    quote: str | None = None
    i = last = 0
    while i < len(s):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            m = rx["CASE"].match(s, i)
            if m:
                case_depth += 1
                i = m.end()
                continue
            m = rx["END"].match(s, i)
            if m and case_depth:
                case_depth -= 1
                i = m.end()
                continue
            if not case_depth:
                if rx["OR"].match(s, i):
                    return [s.strip()]
                m = rx["BETWEEN"].match(s, i)
                if m:
                    between += 1
                    i = m.end()
                    continue
                m = rx["AND"].match(s, i)
                if m:
                    if between:
                        between -= 1
                        i = m.end()
                        continue
                    parts.append(s[last:i])
                    last = i = m.end()
                    continue
        i += 1
    parts.append(s[last:])
    return [p.strip() for p in parts if p.strip()]


_EXISTS_RX = re.compile(
    r"^\s*(not\s+)?exists\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_IN_RX = re.compile(
    r"^\s*(.+?)\s+(not\s+)?in\s*\(\s*(select\b.*)\)\s*$", re.IGNORECASE | re.DOTALL
)


def _lower_existence(conj: str) -> tuple[str, str, str] | None:
    """Lower one WHERE conjunct of the form ``[NOT] EXISTS (SELECT ...
    FROM t WHERE cond)`` or ``x IN (SELECT col FROM t [WHERE pred])`` to
    a ``(table, on, how)`` semi/anti join spec; None if the conjunct is
    not an existence test.  ``NOT IN`` is rejected: its SQL semantics
    differ from an anti join when the subquery column is NULLable (the
    whole predicate becomes NULL) — users should write NOT EXISTS, which
    is what an anti join actually computes."""
    m = _EXISTS_RX.match(conj)
    if m:
        sub = _find_clause_spans(m.group(2).strip())
        if "from" not in sub or "where" not in sub:
            raise NotImplementedError(
                "EXISTS subquery must be SELECT ... FROM <table> WHERE "
                f"<correlation>: {conj!r}"
            )
        table = sub["from"].strip()
        if re.search(r"\s|\bjoin\b", table, re.IGNORECASE):
            raise NotImplementedError(
                f"EXISTS subquery FROM must name a single table, got {table!r}"
            )
        for k in ("group_by", "having", "qualify", "order_by", "limit"):
            if k in sub:
                raise NotImplementedError(
                    f"EXISTS subquery may not contain {k.upper().replace('_', ' ')}"
                )
        return (table, sub["where"].strip(), "anti" if m.group(1) else "semi")
    m = _IN_RX.match(conj)
    if m:
        if m.group(2):
            raise NotImplementedError(
                "NOT IN (SELECT ...) is not supported: with a NULLable "
                "subquery column it is not an anti join — write NOT EXISTS"
            )
        sub = _find_clause_spans(m.group(3).strip())
        if "from" not in sub:
            raise NotImplementedError(f"IN subquery must have FROM: {conj!r}")
        table = sub["from"].strip()
        if re.search(r"\s|\bjoin\b", table, re.IGNORECASE):
            raise NotImplementedError(
                f"IN subquery FROM must name a single table, got {table!r}"
            )
        cols = _split_top_level(sub.get("select", ""))
        if len(cols) != 1:
            raise NotImplementedError(
                f"IN subquery must select exactly one column: {conj!r}"
            )
        for k in ("group_by", "having", "qualify", "order_by", "limit"):
            if k in sub:
                raise NotImplementedError(
                    f"IN subquery may not contain {k.upper().replace('_', ' ')}"
                )
        on = f"{m.group(1).strip()} = {cols[0]}"
        if "where" in sub:
            on += f" AND {sub['where'].strip()}"
        return (table, on, "semi")
    return None


def split_union_all(sql: str) -> list[str]:
    """Split a view SQL on top-level UNION ALL into branch SELECTs.
    Returns [sql] unchanged when no top-level union is present.  Bare
    UNION (distinct union) is rejected — its duplicate elimination
    crosses branches; the maintainable form is UNION ALL (linear delta
    rule), optionally composed with a downstream SELECT DISTINCT view.
    """
    sql = sql.strip().rstrip(";").strip()
    parts = _split_top_level_kw(sql, r"\bunion\s+all\b")
    for p in parts:
        # quote-aware bare-UNION detection: the word inside a string
        # literal (WHERE c = 'union square') must not trigger rejection
        if re.match(r"^union\b", p, re.IGNORECASE) or (
            len(_split_top_level_kw(p, r"\bunion\b")) > 1
        ):
            raise NotImplementedError(
                "bare UNION (distinct) is not maintainable across branches — "
                "use UNION ALL (compose with a SELECT DISTINCT view for set "
                "semantics)"
            )
    return parts


def parse_view_sql(name: str, sql: str) -> ViewDef:
    """Parse restricted SQL into a ViewDef.

    Raises NotImplementedError for clauses outside the supported surface
    (subqueries other than existence tests), mirroring the reference's
    NotImplementedException on unsupported plan nodes
    (ivm_rewrite_rule.hpp:282-283).  HAVING (which the reference rejects,
    README.md:36) is accepted: it must reference output aliases or group
    columns, and is applied to the *public* view on read — maintained
    state stays pre-HAVING so groups can cross the threshold later.
    ORDER BY / LIMIT (top-k views) likewise apply on read: maintained
    state is the full pre-limit view (a row's rank can change under later
    deltas); LIMIT requires an ORDER BY for determinism.
    """
    sql = sql.strip().rstrip(";").strip()
    spans = _find_clause_spans(sql)
    if "select" not in spans or "from" not in spans:
        raise ValueError(f"view SQL must be SELECT ... FROM ...: {sql!r}")
    order_by: list[tuple[str, str]] = []
    if "order_by" in spans:
        for item in _split_top_level(spans["order_by"]):
            om = re.match(
                r"^(.*?)\s+(asc|desc)\s*$", item.strip(), re.IGNORECASE | re.DOTALL
            )
            if om:
                order_by.append((om.group(1).strip(), om.group(2).lower()))
            else:
                order_by.append((item.strip(), "asc"))
    limit: int | None = None
    if "limit" in spans:
        body = spans["limit"].strip()
        if not body.isdigit():
            raise NotImplementedError(f"LIMIT must be an integer literal, got {body!r}")
        limit = int(body)

    # WHERE [NOT] EXISTS / IN (SELECT ...) conjuncts lower to semi/anti
    # joins BEFORE the blanket nested-subquery rejection — the reference
    # rejects all subqueries (README.md:36); correlated existence tests
    # are the one shape our delta algebra covers (counting rule).
    exists_joins: list[tuple[str, str, str]] = []
    if "where" in spans:
        spans = dict(spans)
        remaining: list[str] = []
        for conj in _split_conjuncts(spans["where"]):
            lowered = _lower_existence(conj)
            if lowered is None:
                remaining.append(conj)
            else:
                exists_joins.append(lowered)
        if remaining:
            spans["where"] = " AND ".join(
                f"({c})" if len(remaining) > 1 else c for c in remaining
            )
        else:
            del spans["where"]
    for part in spans.values():
        if re.search(r"\(\s*select\b", part, re.IGNORECASE):
            raise NotImplementedError(
                "nested subqueries are not supported in view definitions "
                "(except top-level WHERE [NOT] EXISTS / IN (SELECT ...) "
                "existence tests, which lower to semi/anti joins)"
            )

    # FROM clause: first table, then
    # [INNER|LEFT|RIGHT|FULL [OUTER]|[LEFT] SEMI|[LEFT] ANTI] JOIN ... ON ...
    from_body = spans["from"]
    jrx = re.compile(
        r"\b(?:(left|right|full)\s+(?:outer\s+)?|(?:left\s+)?(semi|anti)\s+"
        r"|(?:inner\s+))?join\b",
        re.IGNORECASE,
    )
    jmatches = list(jrx.finditer(from_body))
    source = (from_body[: jmatches[0].start()] if jmatches else from_body).strip()
    if re.search(r"\s", source):
        raise NotImplementedError(f"FROM must name a single registered table, got {source!r}")
    raw_joins: list[tuple[str, str, str]] = []  # (table, on, how)
    for idx, jm in enumerate(jmatches):
        how = (jm.group(1) or jm.group(2) or "inner").lower()
        end = jmatches[idx + 1].start() if idx + 1 < len(jmatches) else len(from_body)
        jp = from_body[jm.end() : end]
        m = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s+on\s+(.+)$", jp.strip(), re.IGNORECASE | re.DOTALL)
        if not m:
            raise NotImplementedError(f"JOIN clause must be 'JOIN <table> ON <cond>': {jp!r}")
        raw_joins.append((m.group(1), m.group(2).strip(), how))
    # RIGHT JOIN normalization: 'L RIGHT JOIN R ON c' == 'R LEFT JOIN L ON c'
    # (table swap only possible for the two-table case; select exprs are
    # name-resolved so they are unaffected by the FROM reordering)
    if len(raw_joins) == 1 and raw_joins[0][2] == "right":
        table, on, _ = raw_joins[0]
        source, raw_joins = table, [(source, on, "left")]
    elif any(how == "right" for _, _, how in raw_joins):
        raise NotImplementedError(
            "RIGHT JOIN is only supported in two-table views (normalized to LEFT)"
        )
    joins = [JoinSpec(table=t, on=on, how=how) for t, on, how in raw_joins]
    joins += [JoinSpec(table=t, on=on, how=how) for t, on, how in exists_joins]

    select_body = spans["select"]
    dm = re.match(r"^\s*distinct\b(.*)$", select_body, re.IGNORECASE | re.DOTALL)
    distinct = bool(dm)
    if dm:
        select_body = dm.group(1)
    group_by, grouping_sets = _parse_group_by(spans.get("group_by"))

    select_items = _split_top_level(select_body)
    # a window item in an AGGREGATE view (aggregates present or GROUP BY)
    # is a READ-WINDOW: recomputed on read over the merged state, which
    # IS the bounded delta region — so global (partition-less) windows
    # are accepted there (ViewDef.read_windows).  An aggregate call
    # carrying OVER is a window, not a grouped aggregate — decided by
    # the quote-aware window scanner, not a raw OVER substring test,
    # so count(CASE WHEN status = 'rolled over' ...) stays an aggregate.
    agg_view = bool(group_by) or any(
        _AGG_RE.match(
            (_ALIAS_RE.match(i).group(1).strip() if _ALIAS_RE.match(i) else i)
        )
        and not _window_partitions_of(i, allow_global=True)
        for i in select_items
    )
    select: list[tuple[str, str]] = []
    aggregates: list[Aggregate] = []
    order: list[str] = []        # state column order (no read-windows)
    porder: list[str] = []       # public select-list order
    read_windows: list[tuple[str, str]] = []
    window_partition: list[str] = []
    for item in select_items:
        alias = None
        am = _ALIAS_RE.match(item)
        expr = item
        if am:
            expr, alias = am.group(1).strip(), am.group(2)
        wps = _window_partitions_of(expr, allow_global=agg_view)
        if wps:
            if agg_view:
                if alias is None:
                    raise NotImplementedError(
                        "window expressions over an aggregate view must "
                        f"have an AS alias: {expr!r}"
                    )
                read_windows.append((expr, alias))
                porder.append(alias)
                continue
            for wp in wps:
                if window_partition and tuple(window_partition) != wp:
                    # plain single-table multi-list views are FUSED into
                    # one maintained unit BEFORE parsing
                    # (split_window_stages) — reaching here means the
                    # view also uses clauses outside that grammar
                    raise NotImplementedError(
                        "window functions over DIFFERENT PARTITION BY "
                        f"lists ({tuple(window_partition)} and {wp}) are "
                        "fused only in plain single-table window "
                        "views (no joins/aggregates/DISTINCT/ORDER BY/"
                        "LIMIT/UNION) — compose the rest in a cascaded view"
                    )
                window_partition = list(wp)
            alias = alias or expr
            select.append((expr, alias))
            order.append(alias)
            porder.append(alias)
            continue
        agg = _AGG_RE.match(expr)
        if agg:
            fn = agg.group(1).lower()
            fn = _AGG_CANON.get(fn, fn)
            arg = agg.group(2).strip()
            dm = re.match(r"^distinct\s+(.*)$", arg, re.IGNORECASE | re.DOTALL)
            if dm:
                if fn not in ("count", "sum", "avg"):
                    raise NotImplementedError(
                        f"DISTINCT only supported for count/sum/avg, got {fn}"
                    )
                fn, arg = f"{fn}_distinct", dm.group(1).strip()
            alias = alias or expr
            param = None
            if fn == "percentile":
                # percentile(expr, fraction) — Spark's surface syntax
                args = _split_top_level(arg)
                if len(args) != 2:
                    raise NotImplementedError(
                        f"percentile takes (expr, fraction), got {arg!r}"
                    )
                arg = args[0].strip()
                try:
                    param = float(args[1].strip())
                except ValueError:
                    raise NotImplementedError(
                        f"percentile fraction must be a literal, got {args[1]!r}"
                    ) from None
            aggregates.append(Aggregate(fn=fn, expr=arg, alias=alias, param=param))
        else:
            alias = alias or expr
            select.append((expr, alias))
        order.append(alias)
        porder.append(alias)

    return ViewDef(
        name=name,
        source=source,
        select=tuple(select),
        aggregates=tuple(aggregates),
        where=spans.get("where"),
        group_by=group_by,
        joins=tuple(joins),
        output_order=tuple(order),
        having=spans.get("having"),
        qualify=spans.get("qualify"),
        distinct=distinct,
        grouping_sets=grouping_sets,
        order_by=tuple(order_by),
        limit=limit,
        window_partition=tuple(window_partition),
        read_windows=tuple(read_windows),
        public_order=tuple(porder) if read_windows else (),
    )


def split_window_stages(
    sql: str,
) -> tuple[str, str | None, list[tuple[str, str, tuple[str, ...]]], list[tuple[str, ...]]] | None:
    """Detect a window view whose OVER clauses use MORE THAN ONE
    PARTITION BY column list and return the pieces the engine needs to
    maintain it as one FUSED multi-list view (round 8,
    windowcdc.multi_window_view_delta via ViewDef.window_lists; round 7
    built a cascade of per-list IMMVs from the same pieces — previously
    such views were rejected with "all window functions in a view must
    share ONE PARTITION BY column list").

    Returns ``(source, where, items, lists)`` with ``items`` =
    ``[(expr, alias, partition_list-or-())...]`` in select order and
    ``lists`` the distinct partition lists in first-appearance order —
    or ``None`` when the view has at most one list (the single-ViewDef
    path handles it) or uses clauses outside the window-view grammar
    (joins/aggregates/DISTINCT/ORDER BY/LIMIT — the ordinary parser
    produces its usual rejection).

    Restriction: all windows within ONE select item must share a list
    (an item mixing two lists would need expression rewriting to split).
    """
    sql = sql.strip().rstrip(";").strip()
    spans = _find_clause_spans(sql)
    if "select" not in spans or "from" not in spans:
        return None
    if any(
        k in spans for k in ("group_by", "having", "qualify", "order_by", "limit")
    ):
        return None
    source = spans["from"].strip()
    if re.search(r"\s", source):  # joins present
        return None
    if "where" in spans and re.search(
        r"\(\s*select\b", spans["where"], re.IGNORECASE
    ):
        # existence-test lowering lives in parse_view_sql; a cascade
        # stage's WHERE must be a plain row-local filter — fall through
        # to the ordinary parser and its clean rejection
        return None
    body = spans["select"]
    if re.match(r"^\s*distinct\b", body, re.IGNORECASE):
        return None
    items: list[tuple[str, str, tuple[str, ...]]] = []
    lists: list[tuple[str, ...]] = []
    saw_window = False
    for item in _split_top_level(body):
        alias = None
        am = _ALIAS_RE.match(item)
        expr = item
        if am:
            expr, alias = am.group(1).strip(), am.group(2)
        if not _OVER_KW.search(expr) or not _window_partitions_of(
            expr, allow_global=True
        ):
            if _AGG_RE.match(expr):
                # a bare aggregate (sum(v) with no OVER) makes this an
                # AGGREGATE view, not a window view — fall through to
                # parse_view_sql, whose agg/read-window routing (or
                # clean NotImplementedError) applies, instead of
                # failing later with Spark's opaque mixed-aggregate
                # AnalysisException
                return None
            items.append((expr, alias or expr, ()))
            continue
        wps = _window_partitions_of(expr)
        saw_window = True
        first = wps[0]
        for wp in wps[1:]:
            if wp != first:
                raise NotImplementedError(
                    "all window functions within ONE select item must "
                    f"share a PARTITION BY list, got {first} and {wp} in "
                    f"{expr!r} — split the item across aliases"
                )
        if alias is None:
            # an unaliased window item's output column would be the raw
            # expression TEXT — unreadable downstream and fragile to
            # re-parse.  Plain aliases only (kept from the cascade era;
            # the fused rule itself would tolerate it).
            raise NotImplementedError(
                "window expressions in a multi-PARTITION-BY view must "
                f"each have an AS alias: {expr!r}"
            )
        if first not in lists:
            lists.append(first)
        items.append((expr, alias, first))
    if not saw_window or len(lists) <= 1:
        return None
    return source, spans.get("where"), items, lists


def split_window_over_join(sql: str) -> tuple[str, str | None, str] | None:
    """Detect a WINDOW view over a JOIN — ``SELECT … rank() OVER
    (PARTITION BY …) … FROM a JOIN b ON …`` — and return
    ``(from_clause, where, select_body)`` for the engine to compose
    (round 9): an inner maintained JOIN view, an implicit snapshot of
    its public state, and the window view hung off the snapshot — the
    exact cascade a user could previously only hand-assemble via
    merge_view_cdc + register_delta.

    Returns ``None`` when the view is not this shape: no join, no
    window, any aggregate select item (no composition rule — windows
    evaluate over the JOIN's rows, not over groups), or clauses outside
    the window-view grammar (GROUP BY / HAVING / QUALIFY / ORDER BY /
    LIMIT / DISTINCT) — the ordinary parser then produces its usual
    routing or rejection."""
    sql = sql.strip().rstrip(";").strip()
    spans = _find_clause_spans(sql)
    if "select" not in spans or "from" not in spans:
        return None
    if any(
        k in spans for k in ("group_by", "having", "qualify", "order_by", "limit")
    ):
        return None
    body = spans["select"]
    if re.match(r"^\s*distinct\b", body, re.IGNORECASE):
        return None
    frm = spans["from"].strip()
    if not re.search(r"\bjoin\b", frm, re.IGNORECASE):
        return None
    saw_window = False
    for item in _split_top_level(body):
        expr = item
        am = _ALIAS_RE.match(item)
        if am:
            expr = am.group(1).strip()
        if _OVER_KW.search(expr) and _window_partitions_of(
            expr, allow_global=True
        ):
            saw_window = True
        elif _AGG_RE.match(expr):
            return None
    if not saw_window:
        return None
    return frm, spans.get("where"), body


_OVER_KW = re.compile(r"\bover\b", re.IGNORECASE)
_PLAIN_COL = re.compile(r"^[A-Za-z_][A-Za-z_0-9]*$")


def _window_partitions_of(
    expr: str, allow_global: bool = False
) -> list[tuple[str, ...]]:
    """PARTITION BY column lists of every ``OVER (...)`` in a select
    item, AT ANY NESTING DEPTH (empty list = no window function) — a
    window wrapped in an outer call (``coalesce(sum(v) OVER w, 0)``) is
    still partition-local, and missing it would silently maintain the
    view as a plain projection (window evaluated over the delta batch
    alone).  Restricted grammar: each OVER must open with PARTITION BY
    over plain columns — those keys ARE the maintenance delta region
    (viewdef.window_partition), so a global window (no partition) is
    rejected: its delta region would be the whole table.  With
    ``allow_global=True`` (aggregate views, whose merged state is the
    bounded delta region — ViewDef.read_windows) a partition-less OVER
    contributes ``()`` instead of raising.  A bare ``over`` identifier
    not followed by ``(`` is left alone."""
    outs: list[tuple[str, ...]] = []
    quote: str | None = None
    i = 0
    while i < len(expr):
        ch = expr[i]
        if quote:
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"'):
            quote = ch
            i += 1
            continue
        m = _OVER_KW.match(expr, i)
        if not (
            m and (i == 0 or not (expr[i - 1].isalnum() or expr[i - 1] == "_"))
        ):
            i += 1
            continue
        # absolute index of the opening paren (only whitespace between)
        k = m.end()
        while k < len(expr) and expr[k].isspace():
            k += 1
        if k >= len(expr) or expr[k] != "(":
            # not a window clause (e.g. a column named "over")
            i = m.end()
            continue
        d2 = 0
        body = None
        for j in range(k, len(expr)):
            c2 = expr[j]
            if c2 == "(":
                d2 += 1
            elif c2 == ")":
                d2 -= 1
                if d2 == 0:
                    body = expr[k + 1 : j]
                    break
        if body is None:
            raise NotImplementedError(f"unbalanced OVER: {expr!r}")
        pm = re.match(
            r"^\s*partition\s+by\s+(.*)$", body, re.IGNORECASE | re.DOTALL
        )
        if not pm:
            if allow_global:
                outs.append(())
                i = j + 1  # continue past the whole OVER (...) group
                continue
            raise NotImplementedError(
                "window views over a raw table require OVER (PARTITION "
                "BY ...) — a global window has no bounded delta region "
                "there.  Global windows ARE supported over a maintained "
                "AGGREGATE view's output (add the window to a GROUP BY "
                f"view; it is recomputed on read over the state): {expr!r}"
            )
        tail = pm.group(1)
        cut = re.search(
            r"\border\s+by\b|\brows\b|\brange\b", tail, re.IGNORECASE
        )
        cols_part = tail[: cut.start()] if cut else tail
        cols = tuple(
            c.strip() for c in _split_top_level(cols_part) if c.strip()
        )
        if not cols:
            raise NotImplementedError(
                f"empty PARTITION BY in window view: {expr!r}"
            )
        for c in cols:
            if not _PLAIN_COL.match(c):
                raise NotImplementedError(
                    "window PARTITION BY must list plain columns "
                    f"(the maintenance delta region), got {c!r}"
                )
        outs.append(cols)
        i = j + 1  # continue past the whole OVER (...) group
    return outs


def _parse_group_by(
    body: str | None,
) -> tuple[tuple[str, ...], tuple[tuple[str, ...], ...]]:
    """GROUP BY body → (finest keys, grouping sets).  Plain GROUP BY
    yields empty grouping sets; ROLLUP/CUBE/GROUPING SETS yield the
    explicit set list (maintained at the finest grouping, expanded on
    read — see ViewDef.grouping_sets)."""
    if body is None:
        return (), ()
    body = body.strip()
    m = re.match(r"^(rollup|cube)\s*\((.*)\)$", body, re.IGNORECASE | re.DOTALL)
    if m:
        keys = tuple(k.strip() for k in _split_top_level(m.group(2)))
        if m.group(1).lower() == "rollup":
            sets = tuple(tuple(keys[:k]) for k in range(len(keys), -1, -1))
        else:
            from itertools import combinations

            sets = tuple(
                tuple(c)
                for k in range(len(keys), -1, -1)
                for c in combinations(keys, k)
            )
        return keys, sets
    m = re.match(r"^grouping\s+sets\s*\((.*)\)$", body, re.IGNORECASE | re.DOTALL)
    if m:
        sets = []
        for part in _split_top_level(m.group(1)):
            part = part.strip()
            if not (part.startswith("(") and part.endswith(")")):
                raise NotImplementedError(
                    f"GROUPING SETS items must be parenthesized, got {part!r}"
                )
            inner = part[1:-1].strip()
            sets.append(
                tuple(k.strip() for k in _split_top_level(inner)) if inner else ()
            )
        keys: list[str] = []
        for gs in sets:
            for k in gs:
                if k not in keys:
                    keys.append(k)
        return tuple(keys), tuple(sets)
    return tuple(_split_top_level(body)), ()
