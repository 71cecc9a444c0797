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
