"""Deterministic fixed-bin histogram quantile sketch.

The engine maintains EXACT order statistics (MEDIAN/PERCENTILE/MODE)
through the per-(group, value) auxiliary relation (operators/
auxstate.py) — the right tool when per-value state fits.  At 100 TB a
pipeline also wants the cheap, bounded-state variant for monitoring
(document-length / quality-score distributions per source): this module
is that sketch, the quantile analog of the HLL (distinct) and CMS
(frequency) relations.

Design: counters over fixed-width value bins, ``bin = floor((v −
origin) / bin_width)``.  Like the CMS, the bin relation is LINEAR in
the input multiset — deletes subtract, sketches merge by bin-wise
addition, and a maintained sketch advances from the DELTA alone (it is
literally a group-by count view, so every engine delta/merge rule
applies unchanged).  The quantile estimate for fraction p is the
midpoint of the bin containing rank ⌈p·n⌉ (clamped to [1, n]) — error
bounded by bin_width/2, deterministic, and reproducible in ANSI SQL,
so the graded queries are value-hash-checked against a DuckDB
reimplementation of the identical formula (same integer rank rule,
same midpoint arithmetic).

Scale shape: the sketch is ONE map-side-combined shuffle of (group,
bin, count) rows — state O(groups × occupied bins), independent of
input size.  Quantile reads sort only WITHIN a group's occupied bins
(a per-group window over O(bins) rows, never a global sort), and the
requested fractions ride an exploded literal array — no per-fraction
rescan of the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CNT = "cnt"
BIN = "bin"


def hist_sketch(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    bin_width: float,
    origin: float = 0.0,
    weight: str = "1",
) -> DataFrame:
    """The bin-count relation: (group…, bin, cnt), NULL values dropped
    (a quantile over NULLs is undefined; they are counted by the text
    stats, not the sketch).  ``weight`` is a SQL expression per input
    row — pass a ±1 multiplicity expression to build a DELTA sketch
    that :func:`hist_merge` subtracts (CMS-style linearity)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(origin)))
        / F.lit(float(bin_width))
    ).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias(BIN))
        .agg(F.sum(F.expr(weight)).cast("long").alias(CNT))
    )


def hist_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """Bin-wise sum of two sketches (CMS-style linearity; a delta
    sketch built with ±1 weights subtracts).  Bins whose count reaches
    zero are dropped — occupied-bin state only."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, BIN)
        .agg(F.sum(CNT).alias(CNT))
        .filter(F.col(CNT) != 0)
    )


def hist_quantile(
    sketch: DataFrame,
    group_cols: tuple[str, ...],
    fractions: tuple[float, ...],
    bin_width: float,
    origin: float = 0.0,
) -> DataFrame:
    """Quantile estimates per group: (group…, p, est) where ``est`` is
    the midpoint of the bin containing rank ⌈p·n⌉ (p = 0 → rank 1).
    Exactly one output row per (group, fraction)."""
    gw = Window.partitionBy(*[F.col(c) for c in group_cols]) if group_cols else Window.partitionBy(F.lit(1))
    cum_w = gw.orderBy(BIN).rowsBetween(Window.unboundedPreceding, 0)
    fr = F.explode(
        F.array(*[F.lit(float(p)) for p in fractions])
    ).alias("p")
    rows = (
        sketch.withColumn("__cum", F.sum(CNT).over(cum_w))
        .withColumn("__n", F.sum(CNT).over(gw))
        .select("*", fr)
        .withColumn(
            "__rank",
            F.greatest(F.lit(1), F.ceil(F.col("p") * F.col("__n"))).cast("long"),
        )
        .filter(
            (F.col("__cum") >= F.col("__rank"))
            & (F.col("__cum") - F.col(CNT) < F.col("__rank"))
        )
    )
    est = (
        F.lit(float(origin))
        + F.lit(float(bin_width)) * (F.col(BIN).cast("double") + F.lit(0.5))
    ).alias("est")
    return rows.select(*group_cols, "p", est)


def hist_sketch_sql(
    table_expr: str,
    group_cols: tuple[str, ...],
    value_col: str,
    bin_width: float,
    origin: float = 0.0,
) -> str:
    """ANSI-SQL twin of :func:`hist_sketch` — the DuckDB oracle half of
    the graded queries (identical floor/bin arithmetic)."""
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    return f"""
        SELECT {gsel}
               CAST(floor((CAST({value_col} AS DOUBLE) - {origin!r})
                          / {bin_width!r}) AS BIGINT) AS bin,
               count(*) AS cnt
        FROM {table_expr}
        WHERE {value_col} IS NOT NULL
        GROUP BY {gsel}bin
    """


def hist_quantile_sql(
    sketch_sql: str,
    group_cols: tuple[str, ...],
    fractions: tuple[float, ...],
    bin_width: float,
    origin: float = 0.0,
) -> str:
    """ANSI-SQL twin of :func:`hist_quantile` over a sketch subquery."""
    g = ", ".join(group_cols)
    gsel = f"{g}, " if g else ""
    part = f"PARTITION BY {g}" if g else ""
    # CAST: a bare VALUES (0.25) is DECIMAL in DuckDB, and the Spark
    # side emits DOUBLE fractions — the hash compare is type-sensitive
    fr_rows = ", ".join(f"(CAST({float(p)!r} AS DOUBLE))" for p in fractions)
    return f"""
        WITH sk AS ({sketch_sql}),
        cum AS (
            SELECT {gsel}bin, cnt,
                   sum(cnt) OVER ({part} ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
                   sum(cnt) OVER ({part}) AS n
            FROM sk
        ),
        fr(p) AS (VALUES {fr_rows})
        SELECT {gsel}fr.p AS p,
               {origin!r} + {bin_width!r} * (CAST(bin AS DOUBLE) + 0.5) AS est
        FROM cum CROSS JOIN fr
        WHERE c >= greatest(1, CAST(ceil(fr.p * n) AS BIGINT))
          AND c - cnt < greatest(1, CAST(ceil(fr.p * n) AS BIGINT))
    """
