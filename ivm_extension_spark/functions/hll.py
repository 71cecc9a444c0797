"""Deterministic, engine-portable HyperLogLog.

Spark's ``approx_count_distinct`` (HLL++) and DuckDB's ``approx_*``
produce engine-specific estimates, so a query using them can only ever
be rows-only checked.  This module implements classic HyperLogLog
(Flajolet et al. 2007) from scratch as PLAIN SQL EXPRESSIONS over an
md5-derived hash, so the registers AND the estimate are bit-identical
across any engine that can run the same expressions — the graded
``approx_distinct_sketch`` query is value-hash-checked against a DuckDB
reimplementation of the identical formula.

Register construction (p bucket bits over a 60-bit md5-derived hash):

    h      = int(md5(value)[:15], 16)          # 60 bits, engine-portable
    bucket = h & (2^p - 1)
    w      = h >> p                            # 60 - p bits
    rho    = 1 + trailing_zeros(w)             # 61 - p when w == 0

``rho`` uses TRAILING zeros of the suffix (position of the lowest set
bit, isolated via ``w & -w`` — its log2 is exact in a double for any
power of two < 2^53... and < 2^60 is still exactly representable, since
powers of two are exact at any magnitude).  Trailing vs the textbook's
leading zeros is an arbitrary orientation choice with the same
geometric distribution.

Scale shape: registers are a ``groupBy(group, bucket).max(rho)`` —
ONE shuffle of (group, bucket, tinyint)-sized rows with full map-side
combine; register relations merge by the same max, so they are
trivially maintainable under inserts (IVM: max is monotone) and
mergeable across partitions/days/engines.

The estimator is the classic one with the small-range linear-counting
correction:

    E = alpha_m * m^2 / (zeros + sum(2^-rho_j))    over present buckets
    if E <= 2.5 m and zeros > 0:  E = m * ln(m / zeros)

(no long-range correction: 60-bit hash collisions are negligible at any
cardinality a 100 TB table can hold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hash60_expr(col: str) -> str:
    """60-bit engine-portable hash: int(md5(value)[:15], 16).  The value
    is cast to string first so numeric/string inputs hash identically
    everywhere."""
    return f"cast(conv(substring(md5(cast({col} as string)), 1, 15), 16, 10) as bigint)"


def rho_expr(h: str, p: int) -> str:
    """1 + trailing_zeros(h >> p), with the all-zero suffix mapped to
    the maximum rho (61 - p).  ``w & -w`` isolates the lowest set bit;
    log2 of an exact power of two is exact in float64."""
    w = f"shiftright({h}, {p})"
    return (
        f"CASE WHEN {w} = 0 THEN {61 - p} "
        f"ELSE cast(log2(cast(({w}) & -({w}) as double)) as int) + 1 END"
    )


def hll_registers(
    df: DataFrame, group_cols: tuple[str, ...], value_col: str, p: int = 12
) -> DataFrame:
    """Register relation: (group..., bucket, r) with r = max rho per
    bucket.  ONE shuffle, map-side combined; merge two register
    relations with the same groupBy/max."""
    h = hash60_expr(value_col)
    m = 1 << p
    return (
        # NULLs don't count as a distinct value (countDistinct
        # semantics); unfiltered they'd emit a phantom NULL register that
        # biases the estimate
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.expr(f"({h}) & {m - 1}").alias("bucket"),
            F.expr(rho_expr(h, p)).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: tuple[str, ...]) -> DataFrame:
    """⊎ for register relations: bucket-wise max.  This is the IVM merge
    for insert-only distinct-count maintenance — O(m) state per group,
    never rescanning the base."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: tuple[str, ...], p: int = 12
) -> DataFrame:
    """(group..., n_distinct_hll): the classic HLL estimate, rounded to
    BIGINT.  Absent buckets contribute 2^0 = 1 to the harmonic sum and
    count as zeros for the linear-counting branch."""
    m = 1 << p
    alpha = _alpha(m)
    # the harmonic sum Σ 2^-rho must be ORDER-INDEPENDENT to hash
    # identically across engines (float addition is not associative), so
    # each term is scaled to the exact integer 2^(61-rho) and summed in
    # decimal(38,0) — the single double rounding happens once, on the
    # final exact total
    agg = registers.groupBy(*group_cols).agg(
        F.expr(
            "sum(cast(shiftleft(cast(1 as bigint), 61 - r) as decimal(38,0)))"
        ).alias("__si"),
        F.count(F.lit(1)).alias("__b"),
    )
    # decimal-point literals parse as DECIMAL in both engines — every
    # float constant must be an explicit double for the math to be IEEE
    # double end-to-end (and identical across engines)
    def dlit(x: float) -> str:
        return f"cast({float(x)!r} as double)"

    scale = float(1 << 61)
    zeros = f"(cast({m} as double) - cast(__b as double))"
    s = f"(cast(__si as double) / {dlit(scale)})"
    raw = f"({dlit(alpha)} * {dlit(m * m)} / ({zeros} + {s}))"
    lin = f"(cast({m} as double) * ln(cast({m} as double) / {zeros}))"
    est = (
        f"CASE WHEN ({raw}) <= {dlit(2.5 * m)} AND {zeros} > 0 "
        f"THEN {lin} ELSE {raw} END"
    )
    return agg.select(
        *group_cols,
        F.expr(f"cast(round({est}) as bigint)").alias("n_distinct_hll"),
    )


def hll_distinct(
    df: DataFrame, group_cols: tuple[str, ...], value_col: str, p: int = 12
) -> DataFrame:
    """groupBy(group).approx-distinct(value) end-to-end, deterministic
    across engines.  Standard error ≈ 1.04 / sqrt(2^p) (~1.6% at the
    default p=12, m=4096 registers per group)."""
    return hll_estimate(hll_registers(df, group_cols, value_col, p), group_cols, p)


def hll_oracle_sql(
    table: str, group_cols: tuple[str, ...], value_col: str, p: int = 12
) -> str:
    """DuckDB twin of :func:`hll_distinct` — the IDENTICAL formula over
    the identical md5-derived hash, for oracle checking."""
    m = 1 << p
    alpha = _alpha(m)
    gcols = ", ".join(group_cols)
    h = f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    w = f"({h} >> {p})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {61 - p} "
        f"ELSE CAST(log2(CAST({w} & -{w} AS DOUBLE)) AS INT) + 1 END"
    )
    def dlit(x: float) -> str:
        return f"CAST({float(x)!r} AS DOUBLE)"

    scale = float(1 << 61)
    zeros = f"(CAST({m} AS DOUBLE) - CAST(__b AS DOUBLE))"
    s = f"(CAST(__si AS DOUBLE) / {dlit(scale)})"
    raw = f"({dlit(alpha)} * {dlit(m * m)} / ({zeros} + {s}))"
    lin = f"(CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / {zeros}))"
    est = (
        f"CASE WHEN ({raw}) <= {dlit(2.5 * m)} AND {zeros} > 0 "
        f"THEN {lin} ELSE {raw} END"
    )
    return f"""
        WITH regs AS (
            SELECT {gcols}, ({h}) & {m - 1} AS bucket, max({rho}) AS r
            FROM {table}
            WHERE {value_col} IS NOT NULL
            GROUP BY {gcols}, ({h}) & {m - 1}
        ),
        agg AS (
            SELECT {gcols},
                   sum(1::BIGINT << (61 - r)) AS __si,
                   count(*) AS __b
            FROM regs GROUP BY {gcols}
        )
        SELECT {gcols}, CAST(round({est}) AS BIGINT) AS n_distinct_hll
        FROM agg
    """
