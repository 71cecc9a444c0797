"""Deterministic, engine-portable Count-Min sketch (CMS).

Cormode & Muthukrishnan 2005: d hash rows × w buckets of COUNTERS;
insert adds the row's weight to one bucket per hash row, the point
estimate is the MIN over rows.  Always an overestimate (never under),
error ≤ e·N/w with probability 1 − e^−d.

Why it's here: the CMS is LINEAR in the input multiset — counters are
plain sums of signed weights — so it is the natural incrementally-
maintainable frequency sketch: deletes subtract, two sketches merge by
bucket-wise addition, and a maintained sketch view advances from the
DELTA alone without rescanning the base (same role the HLL register
relation plays for distinct counts, functions/hll.py).

Like the HLL module, every hash is a PLAIN SQL expression over md5 so
the counters AND the estimates are bit-identical across engines — the
graded ``approx_heavy_hitters`` / ``ivm_merge_cms_sketch`` queries are
value-hash-checked against a DuckDB reimplementation of the identical
formula.

    h_j(v) = int(md5(cast(v as string) || '#' || j)[:15], 16) % w

Scale shape: the sketch relation is ``groupBy(group, row_j, bucket)
.sum(weight)`` over a d-fold literal-array explode — ONE shuffle of
(group, tinyint, int, bigint) rows with full map-side combine (the d×
row expansion feeds straight into the partial aggregate inside the same
stage; the md5 work after the explode is per-emitted-row by necessity,
not a re-evaluation hazard).  State is O(groups × d × w) counters,
independent of input size.  Estimation probes join the TINY candidate
relation against the sketch on (row_j, bucket) — the sketch is never
rescanned per candidate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

D_DEFAULT = 4
W_DEFAULT = 1024


def cms_bucket_expr(col: str, row_j: str, w: int) -> str:
    """Engine-portable bucket: md5 of ``value '#' row`` folded to 60
    bits then reduced mod w (nonnegative, so % agrees across engines)."""
    h = (
        f"cast(conv(substring(md5(concat(cast({col} as string), '#', "
        f"cast({row_j} as string))), 1, 15), 16, 10) as bigint)"
    )
    return f"({h}) % {w}"


def _rows(d: int) -> Column:
    return F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row_j")


def cms_sketch(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
    weight: str = "1",
) -> DataFrame:
    """Sketch relation (group..., row_j, bucket, c): c = Σ weight per
    counter.  ``weight`` is a SQL expression over df's columns — pass a
    signed ±1 for delta batches (deletes subtract).  NULL values don't
    count (frequency of NULL is not defined, mirroring count(col))."""
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.expr(f"cast(({weight}) as bigint)").alias("__wt"),
        _rows(d),
    )
    return (
        rows.select(
            *group_cols,
            "row_j",
            F.expr(cms_bucket_expr("__v", "row_j", w)).alias("bucket"),
            "__wt",
        )
        .groupBy(*group_cols, "row_j", "bucket")
        .agg(F.sum("__wt").alias("c"))
    )


def cms_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """⊎ for sketch relations: bucket-wise sum, zero counters pruned —
    the IVM merge (state advances from the delta sketch alone)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "row_j", "bucket")
        .agg(F.sum("c").alias("c"))
        .filter(F.col("c") != 0)
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    group_cols: tuple[str, ...],
    item_col: str,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> DataFrame:
    """(group..., item, est_count): min over hash rows of the probed
    counters (absent counter = 0).  ``items`` is the candidate relation
    (CMS enumerates nothing by itself); keep it small — it is joined
    against the sketch on (group, row_j, bucket)."""
    probes = items.select(*group_cols, F.col(item_col), _rows(d)).withColumn(
        "bucket", F.expr(cms_bucket_expr(item_col, "row_j", w))
    )
    joined = probes.join(
        sketch, on=[*group_cols, "row_j", "bucket"], how="left"
    )
    return joined.groupBy(*group_cols, item_col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count")
    )


def cms_heavy_hitters(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    phi: float = 0.02,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> DataFrame:
    """(group..., value, est_count) for every distinct value whose CMS
    estimate is ≥ phi · N (N = the group's total row weight, read off
    the sketch itself: one hash row holds every row's weight exactly
    once).  Candidates = the distinct values — at 100 TB swap in any
    cheaper candidate source (e.g. the delta's values) without touching
    the sketch."""
    sketch = cms_sketch(df, group_cols, value_col, d, w)
    items = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, value_col
    ).distinct()
    est = cms_estimate(sketch, items, group_cols, value_col, d, w)
    totals = (
        sketch.filter(F.col("row_j") == 0)
        .groupBy(*group_cols)
        .agg(F.sum("c").alias("__n"))
    )
    on = list(group_cols) if group_cols else None
    joined = (
        est.join(F.broadcast(totals), on=on)
        if on
        else est.crossJoin(F.broadcast(totals))
    )
    return joined.filter(
        F.col("est_count") >= F.lit(phi) * F.col("__n")
    ).drop("__n")


def cms_sketch_sql(
    table: str,
    group_cols: tuple[str, ...],
    value_col: str,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> str:
    """DuckDB twin of :func:`cms_sketch` (weight 1) as a CTE body."""
    g = "".join(f"{c}, " for c in group_cols)
    h = (
        f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR) || '#' || "
        f"CAST(row_j AS VARCHAR)), 1, 15)) AS BIGINT) % {w}"
    )
    return f"""
        SELECT {g}row_j, {h} AS bucket, CAST(count(*) AS BIGINT) AS c
        FROM {table} CROSS JOIN (SELECT unnest(range({d})) AS row_j) rj
        WHERE {value_col} IS NOT NULL
        GROUP BY {g}row_j, {h}
    """


def cms_heavy_hitters_sql(
    table: str,
    value_col: str,
    phi: float = 0.02,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> str:
    """DuckDB twin of :func:`cms_heavy_hitters` (no group columns) —
    the IDENTICAL md5 bucketing, sum, min-over-rows, and threshold."""
    h_item = (
        f"CAST(('0x' || substr(md5(CAST(i.{value_col} AS VARCHAR) || '#' || "
        f"CAST(rj.row_j AS VARCHAR)), 1, 15)) AS BIGINT) % {w}"
    )
    return f"""
        WITH sk AS ({cms_sketch_sql(table, (), value_col, d, w)}),
        items AS (
            SELECT DISTINCT {value_col} FROM {table}
            WHERE {value_col} IS NOT NULL
        ),
        probes AS (
            SELECT i.{value_col}, rj.row_j, {h_item} AS bucket
            FROM items i CROSS JOIN (SELECT unnest(range({d})) AS row_j) rj
        ),
        est AS (
            SELECT p.{value_col},
                   CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est_count
            FROM probes p LEFT JOIN sk s
              ON s.row_j = p.row_j AND s.bucket = p.bucket
            GROUP BY p.{value_col}
        )
        SELECT {value_col}, est_count
        FROM est
        WHERE est_count >= CAST({float(phi)!r} AS DOUBLE) *
              (SELECT sum(c) FROM sk WHERE row_j = 0)
    """
