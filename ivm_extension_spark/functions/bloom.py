"""Deterministic, engine-portable Bloom filter.

Completes the sketch suite next to HLL (cardinality, functions/hll.py),
Count-Min (frequency, functions/cms.py) and the fixed-bin histogram
(quantiles, functions/quantiles.py): approximate SET MEMBERSHIP with no
false negatives.  Spark's own ``bloom_filter_agg``/``might_contain``
(and DuckDB's absence of one) are engine-specific, so — as with the
other sketches — the filter is built from PLAIN SQL EXPRESSIONS over
md5-derived hashes and is bit-identical across engines: the graded
queries are value-hash-checked against a DuckDB reimplementation of the
identical formula.

Construction (k hash functions over an m-bit array, stored as 32-bit
words in BIGINT lanes — DuckDB's checked `<<` overflows at bit 63,
32-bit words keep the mask expression portable):

    h_i(v)  = int(md5(cast(v as string))[8i : 8i+8], 16) % m   i < k
    word    = h_i div 32,   mask = 1 << (h_i % 32)
    state   = (group…, word, bit_or(mask))   -- only non-zero words

k independent 32-bit slices of one md5 (128 bits ≥ 4·32) give the
standard independent-hash approximation; false-positive rate is the
textbook (1 - e^{-kn/m})^k — ~2.4% at the defaults (m=4096, k=4,
n=512 per group), tune m per expected group cardinality.

Scale shape: ONE shuffle of (group, word, bigint) rows with full
map-side combine (bit_or is associative/commutative), state is at most
m/32 words per group regardless of input size.  Merge = word-wise
bit_or — EXACT w.r.t. set union, so the filter is trivially
maintainable under inserts (the same monotone-merge argument as HLL's
register max); deletes go through the COUNTING variant below
(``bloom_counts`` family — per-position signed counters, exact under
arbitrary insert/delete mixes).  Membership probes broadcast the
(group × probe × k) position relation against the state — the base
data is never rescanned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _positions_spark(value_col: str, m_bits: int, k: int) -> list[str]:
    md5 = f"md5(cast({value_col} as string))"
    return [
        f"cast(conv(substring({md5}, {1 + 8 * i}, 8), 16, 10) as bigint) % {m_bits}"
        for i in range(k)
    ]


def _positions_duckdb(value_col: str, m_bits: int, k: int) -> list[str]:
    md5 = f"md5(CAST({value_col} AS VARCHAR))"
    return [
        f"CAST(('0x' || substr({md5}, {1 + 8 * i}, 8)) AS BIGINT) % {m_bits}"
        for i in range(k)
    ]


def bloom_bits(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Per-group Bloom state: (group…, word int, bits bigint), non-zero
    words only.  NULL values are skipped (NULL is a member of nothing).
    """
    if k * 8 > 32:
        raise ValueError(f"k={k} needs {8 * k} hex chars, md5 has 32")
    pos = F.explode(
        F.array(*[F.expr(e) for e in _positions_spark(value_col, m_bits, k)])
    ).alias("__pos")
    gb = [F.col(c) for c in group_cols]
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*gb, pos)
        .groupBy(*group_cols, F.expr("cast(__pos div 32 as int)").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint), cast(__pos % 32 as int)))"
            ).alias("bits")
        )
    )


def bloom_merge(
    a: DataFrame, b: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """Word-wise OR of two Bloom states — exact w.r.t. set union, the
    insert-only IVM merge (state of T ⊎ Δ⁺ == state of T ∪ Δ⁺)."""
    keys = [*group_cols, "word"]
    bb = b.select(*keys, F.col("bits").alias("__bits_b"))
    return (
        a.join(bb, on=keys, how="full")
        .select(
            *keys,
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseOR(
                    F.coalesce(F.col("__bits_b"), F.lit(0))
                )
            ).alias("bits"),
        )
    )


def bloom_contains(
    bits: DataFrame,
    probes: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Membership of each probe value in each group's filter:
    (group…, value, contained bool).  ``probes`` is a 1-column relation
    of ``value_col``; every (group × probe) pair is answered (no false
    negatives; false positives at the textbook rate)."""
    groups = bits.select(*group_cols).distinct() if group_cols else None
    grid = (
        groups.crossJoin(F.broadcast(probes)) if groups is not None else probes
    )
    pos = F.explode(
        F.array(*[F.expr(e) for e in _positions_spark(value_col, m_bits, k)])
    ).alias("__pos")
    pr = grid.select(*group_cols, value_col, pos).select(
        *group_cols,
        value_col,
        F.expr("cast(__pos div 32 as int)").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(__pos % 32 as int))").alias(
            "__mask"
        ),
    )
    st = bits.select(*group_cols, "word", F.col("bits").alias("__bits"))
    j = pr.join(st, on=[*group_cols, "word"], how="left")
    hit = F.when(
        F.col("__bits").isNotNull()
        & (F.col("__bits").bitwiseAND(F.col("__mask")) != 0),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        j.groupBy(*group_cols, value_col)
        .agg(F.min(hit).alias("__all"))
        .select(*group_cols, value_col, (F.col("__all") == 1).alias("contained"))
    )


def bloom_bits_oracle_sql(
    table: str,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> str:
    """DuckDB twin of :func:`bloom_bits` — identical hashes, words and
    bit patterns, for value-hash oracle checking of the state itself."""
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    branches = " UNION ALL ".join(
        f"SELECT {gpfx}({e}) AS pos FROM {table} WHERE {value_col} IS NOT NULL"
        for e in _positions_duckdb(value_col, m_bits, k)
    )
    return f"""
        WITH pos AS ({branches})
        SELECT {gpfx}CAST(pos // 32 AS INT) AS word,
               bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
        FROM pos GROUP BY {gpfx}CAST(pos // 32 AS INT)
    """


def bloom_contains_oracle_sql(
    table: str,
    probes_values_sql: str,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> str:
    """DuckDB twin of :func:`bloom_contains` over ``bloom_bits(table)``;
    ``probes_values_sql`` is a SQL relation with one column named like
    ``value_col``."""
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    gsel = ", ".join(f"g.{c}" for c in group_cols)
    gsel = f"{gsel}, " if group_cols else ""
    gjoin = " AND ".join(f"st.{c} = g.{c}" for c in group_cols) or "TRUE"
    probe_branches = " UNION ALL ".join(
        f"SELECT {value_col}, ({e}) AS pos FROM ({probes_values_sql})"
        for e in _positions_duckdb(value_col, m_bits, k)
    )
    return f"""
        WITH st AS ({bloom_bits_oracle_sql(table, group_cols, value_col, m_bits, k)}),
        grps AS (SELECT DISTINCT {gcols or '1 AS __one'} FROM st),
        pr AS (
            SELECT {value_col}, CAST(pos // 32 AS INT) AS word,
                   1::BIGINT << CAST(pos % 32 AS INT) AS mask
            FROM ({probe_branches})
        )
        SELECT {gsel}pr.{value_col},
               CAST(min(CASE WHEN st.bits IS NOT NULL
                              AND (st.bits & pr.mask) <> 0
                         THEN 1 ELSE 0 END) = 1 AS BOOLEAN) AS contained
        FROM grps g CROSS JOIN pr
        LEFT JOIN st ON {gjoin} AND st.word = pr.word
        GROUP BY {gsel}pr.{value_col}
    """


# -- counting Bloom filter (deletable membership) ---------------------------
#
# The bit filter's word-wise OR merge is exact for set UNION only —
# a delete cannot clear a bit another value may share.  The standard
# fix is the COUNTING filter: per-position counters instead of bits.
# Every value contributes +1 at each of its k positions; a delete
# contributes -1; a position is "set" while its count is positive.
# Exact under arbitrary insert/delete mixes w.r.t. the value MULTISET
# (the same signed-counter argument as the Count-Min sketch), still no
# false negatives, same false-positive rate.  State is O(distinct
# touched positions) <= m rows per group — 32x the bit filter's rows at
# the same m, the textbook space cost of deletability.


def bloom_counts(
    df: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """Per-group counting-Bloom state: (group…, pos int, cnt bigint),
    positive positions only.  ONE map-side-combined count shuffle."""
    if k * 8 > 32:
        raise ValueError(f"k={k} needs {8 * k} hex chars, md5 has 32")
    pos = F.explode(
        F.array(*[F.expr(e) for e in _positions_spark(value_col, m_bits, k)])
    ).alias("__pos")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*[F.col(c) for c in group_cols], pos)
        .groupBy(*group_cols, F.col("__pos").cast("int").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bloom_counts_delta(
    delta: DataFrame,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
    mult_col: str = "_duckdb_ivm_multiplicity",
) -> DataFrame:
    """Signed per-position counts of a multiplicity-tagged delta —
    the exact Δ(bloom_counts) under the engine's CDC contract."""
    pos = F.explode(
        F.array(*[F.expr(e) for e in _positions_spark(value_col, m_bits, k)])
    ).alias("__pos")
    return (
        delta.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(c) for c in group_cols],
            pos,
            F.when(F.col(mult_col), F.lit(1)).otherwise(F.lit(-1)).alias("__s"),
        )
        .groupBy(*group_cols, F.col("__pos").cast("int").alias("pos"))
        .agg(F.sum("__s").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def bloom_counts_merge(
    state: DataFrame, delta_counts: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """state ⊎ Δ: position-wise signed sum, non-positive rows dropped —
    exact w.r.t. the value multiset under arbitrary insert/delete mixes
    (a full-outer fold of two O(positions) relations; the base data is
    never rescanned)."""
    keys = [*group_cols, "pos"]
    d = delta_counts.select(*keys, F.col("cnt").alias("__dc"))
    return (
        state.join(d, on=keys, how="full")
        .select(
            *keys,
            (
                F.coalesce(F.col("cnt"), F.lit(0))
                + F.coalesce(F.col("__dc"), F.lit(0))
            ).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def bloom_counts_oracle_sql(
    table: str,
    group_cols: tuple[str, ...],
    value_col: str,
    m_bits: int = 4096,
    k: int = 4,
) -> str:
    """DuckDB twin of :func:`bloom_counts` — identical positions and
    counts, for bit-exact oracle checking of the counting state."""
    gcols = ", ".join(group_cols)
    gpfx = f"{gcols}, " if group_cols else ""
    branches = " UNION ALL ".join(
        f"SELECT {gpfx}({e}) AS pos FROM {table} WHERE {value_col} IS NOT NULL"
        for e in _positions_duckdb(value_col, m_bits, k)
    )
    return f"""
        WITH pos AS ({branches})
        SELECT {gpfx}CAST(pos AS INT) AS pos, count(*) AS cnt
        FROM pos GROUP BY {gpfx}CAST(pos AS INT)
    """
