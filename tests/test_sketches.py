"""Approximate-aggregate sketches: estimates must sit within their
documented error bounds of the exact answers."""

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark):
    df = spark.range(0, 20000).select(
        (F.col("id") % 50).alias("g"), (F.col("id") % 4001).alias("v")
    )
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    approx = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("v", rsd=0.02).alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(approx[g] - n) <= max(3, 0.1 * n), (g, n, approx[g])


def test_approx_percentile_close_to_exact(spark):
    df = spark.range(0, 10000).select((F.col("id") * 3 % 9973).alias("v"))
    exact_p50 = df.selectExpr("percentile(v, 0.5) AS p").collect()[0]["p"]
    approx_p50 = df.selectExpr("approx_percentile(v, 0.5, 10000) AS p").collect()[0][
        "p"
    ]
    assert abs(approx_p50 - exact_p50) <= 0.01 * 9973


def test_hll_distinct_within_error_bound(spark):
    """Deterministic HLL (functions/hll.py): estimate within ~3 standard
    errors (1.04/sqrt(m) ≈ 1.6% at p=12) of the exact distinct count."""
    from ivm_extension_spark.functions.hll import hll_distinct

    df = spark.range(0, 60000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 7919).alias("v")
    )
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    est = {
        r["g"]: r["n_distinct_hll"]
        for r in hll_distinct(df, ("g",), "v", p=12).collect()
    }
    for g, n in exact.items():
        assert abs(est[g] - n) <= max(5, 0.05 * n), (g, n, est[g])


def test_hll_registers_merge_equals_union(spark):
    """⊎ property: registers(A) max-merged with registers(B) give the
    SAME estimate as registers(A ∪ B) — the insert-only IVM merge."""
    from ivm_extension_spark.functions.hll import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.range(0, 5000).select(F.lit(1).alias("g"), (F.col("id") % 997).alias("v"))
    b = spark.range(3000, 9000).select(
        F.lit(1).alias("g"), (F.col("id") % 997).alias("v")
    )
    merged = hll_estimate(
        hll_merge(hll_registers(a, ("g",), "v"), hll_registers(b, ("g",), "v"), ("g",)),
        ("g",),
    ).collect()[0]["n_distinct_hll"]
    direct = hll_distinct(a.unionByName(b), ("g",), "v").collect()[0][
        "n_distinct_hll"
    ]
    assert merged == direct


def test_hll_deterministic_across_runs(spark):
    from ivm_extension_spark.functions.hll import hll_distinct

    df = spark.range(0, 20000).select(
        F.lit("x").alias("g"), (F.col("id") * 37 % 5003).alias("v")
    )
    vals = {
        hll_distinct(df.repartition(n), ("g",), "v").collect()[0]["n_distinct_hll"]
        for n in (1, 4, 16)
    }
    assert len(vals) == 1  # partitioning/order must not change the estimate
