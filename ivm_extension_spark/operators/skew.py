"""Skew-handling utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in this engine's sessions) handles
most shuffle-join skew at runtime; explicit salting remains necessary
when (a) the join is sort-merge with a key so hot one task's input
exceeds what AQE can split (splitting works on partition boundaries,
not key boundaries — a SINGLE key's rows can't be split by AQE), or
(b) the skew is in an aggregation on a hot group.

``salted_join``: append a random salt in [0, n) to the skewed (big)
side's key, replicate the small side once per salt value, join on
(key, salt).  One hot key's rows now spread over n tasks.  Cost:
|small| x n replication — choose n ~ the worst key's multiple of the
average partition size.

``two_phase_agg``: groupBy (key, salt) partial-aggregate, then groupBy
(key) final-aggregate.  Useful for hot-group count_distinct, where the
map-side partial combine cannot compress (values are distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "__skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: tuple[str, ...],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salts`` times.  Result equals ``big.join(small, on, how)`` for
    'inner' and 'left' joins."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    b = big.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, on=[*on, _SALT], how=how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: tuple[str, ...],
    agg_exprs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot groups: phase 1 aggregates
    (keys, salt) partials, phase 2 combines partials per key.

    ``agg_exprs`` maps alias -> ('sum'|'count'|'max'|'min', column).
    These re-associate cleanly (count combines as sum of partial
    counts); non-decomposable aggregates (count_distinct) must go
    through their own value-level pre-aggregation first.
    """
    partial_cols, final_cols = [], []
    for alias, (fn, col) in agg_exprs.items():
        p = f"__p_{alias}"
        if fn == "count":
            partial_cols.append(F.count(F.col(col)).alias(p))
            final_cols.append(F.sum(F.col(p)).cast("long").alias(alias))
        elif fn == "sum":
            partial_cols.append(F.sum(F.col(col)).alias(p))
            final_cols.append(F.sum(F.col(p)).alias(alias))
        elif fn == "min":
            partial_cols.append(F.min(F.col(col)).alias(p))
            final_cols.append(F.min(F.col(p)).alias(alias))
        elif fn == "max":
            partial_cols.append(F.max(F.col(col)).alias(p))
            final_cols.append(F.max(F.col(p)).alias(alias))
        else:
            raise ValueError(f"non-decomposable aggregate {fn!r}")
    salted = df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, _SALT).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*final_cols)
