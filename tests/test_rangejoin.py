"""Range-join semantics and plan shape (operators/rangejoin.py)."""

from pyspark.sql import functions as F

from ivm_extension_spark.operators.rangejoin import range_join

from tests.conftest import rows


def _points(spark):
    return spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 99.0)], "pid int, pt double"
    )


def _intervals(spark):
    return spark.createDataFrame(
        [(10, 0.0, 10.0), (11, 10.0, 20.0), (12, 4.0, 26.0)],
        "iid int, lo double, hi double",
    )


def test_range_join_inner(spark):
    out = rows(
        range_join(_points(spark), _intervals(spark), "pt", "lo", "hi", bin_width=10.0)
    )
    got = {(r[0], r[2]) for r in out}
    # pt=5 in [0,10] and [4,26]; pt=15 in [10,20] and [4,26]; pt=25 in [4,26]
    assert got == {(1, 10), (1, 12), (2, 11), (2, 12), (3, 12)}


def test_range_join_left_keeps_unmatched(spark):
    out = rows(
        range_join(
            _points(spark), _intervals(spark), "pt", "lo", "hi", bin_width=10.0,
            how="left",
        )
    )
    unmatched = [r for r in out if r[0] == 4]
    assert unmatched == [(4, 99.0, None, None, None)]


def test_range_join_boundaries_inclusive(spark):
    pts = spark.createDataFrame([(1, 10.0), (2, 20.0)], "pid int, pt double")
    iv = spark.createDataFrame([(7, 10.0, 20.0)], "iid int, lo double, hi double")
    out = rows(range_join(pts, iv, "pt", "lo", "hi", bin_width=5.0))
    assert {(r[0], r[2]) for r in out} == {(1, 7), (2, 7)}


def test_range_join_randomized_equals_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    pts = spark.createDataFrame(
        [(int(i), float(rng.uniform(0, 100))) for i in range(200)],
        "pid int, pt double",
    )
    ivs = []
    for i in range(40):
        lo = float(rng.uniform(0, 95))
        ivs.append((int(i), lo, lo + float(rng.uniform(0, 20))))
    iv = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    brute = {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(iv)
        .filter((F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi")))
        .collect()
    }
    binned = {
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "pt", "lo", "hi", bin_width=7.3).collect()
    }
    assert binned == brute


def test_range_join_with_key_and_no_nested_loop(spark):
    pts = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "k string, pid int, pt double"
    )
    iv = spark.createDataFrame(
        [("a", 9, 0.0, 10.0)], "k string, iid int, lo double, hi double"
    )
    j = range_join(pts, iv, "pt", "lo", "hi", bin_width=10.0, key_cols=("k",))
    assert {(r["k"], r["pid"], r["iid"]) for r in j.collect()} == {("a", 1, 9)}
    # the whole point: an equi-join, not BroadcastNestedLoopJoin
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
