"""Salted join / two-phase aggregation must be result-identical to the
plain operators (skew helpers change the plan, never the answer)."""

from pyspark.sql import functions as F

from ivm_extension_spark.operators.skew import salted_join, two_phase_agg

from tests.conftest import rows


def _skewed(spark):
    # 90% of rows share key 0 — the classic hot key
    return spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [(0, "hot"), (1, "a"), (5, "b")], "k int, name string"
    )
    plain = rows(big.join(small, on=["k"]).select("k", "v", "name"))
    salted = rows(salted_join(big, small, on=("k",), n_salts=8).select("k", "v", "name"))
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([(1, "a")], "k int, name string")
    plain = rows(big.join(small, on=["k"], how="left").select("k", "v", "name"))
    salted = rows(
        salted_join(big, small, on=("k",), n_salts=4, how="left").select("k", "v", "name")
    )
    assert salted == plain


def test_two_phase_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = rows(
        df.groupBy("k").agg(
            F.sum("v").alias("s"),
            F.count("v").cast("long").alias("n"),
            F.max("v").alias("mx"),
        )
    )
    two = rows(
        two_phase_agg(
            df, ("k",), {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        )
    )
    assert two == plain
