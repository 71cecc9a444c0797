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


def _bag_apply(spark, base, delta, mult_col="_duckdb_ivm_multiplicity"):
    from pyspark.sql import functions as F

    cols = base.columns
    s = base.withColumn("__s", F.lit(1))
    d = delta.withColumn(
        "__s", F.when(F.col(mult_col), F.lit(1)).otherwise(F.lit(-1))
    ).drop(mult_col)
    return (
        s.unionByName(d)
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(*cols, F.explode(F.expr("sequence(1, __n)")).alias("__i"))
        .drop("__i")
    )


def test_range_left_join_delta_invariant(spark):
    # the IVM invariant V' = V ⊎ ΔV for the banded LEFT join, with deltas
    # on BOTH sides and every interesting transition exercised:
    # - a point (60) whose only band is deleted → flips to NULL-padded
    # - a point (5) inserted with no band → arrives NULL-padded
    # - a previously-unmatched point (300) gaining a band → NULL row retracted
    # - a deleted point (70) that was matched
    from ivm_extension_spark.operators.rangejoin import (
        range_join,
        range_left_join_delta,
    )

    m = "_duckdb_ivm_multiplicity"
    pts = spark.createDataFrame(
        [(1, 10.0), (2, 60.0), (3, 70.0), (4, 300.0), (5, 120.0)],
        "pid long, pt double",
    )
    iv = spark.createDataFrame(
        [("lo", 0.0, 50.0), ("mid", 55.0, 80.0), ("mid2", 100.0, 130.0)],
        "band string, lo double, hi double",
    )
    dpts = spark.createDataFrame(
        [(6, 450.0, True), (3, 70.0, False), (7, 300.0, True)],
        f"pid long, pt double, {m} boolean",
    )
    div = spark.createDataFrame(
        [("mid", 55.0, 80.0, False), ("hi", 250.0, 400.0, True)],
        f"band string, lo double, hi double, {m} boolean",
    )

    dv = range_left_join_delta(pts, iv, dpts, div, "pt", "lo", "hi", bin_width=50.0)
    v_old = range_join(pts, iv, "pt", "lo", "hi", bin_width=50.0, how="left")
    merged = _bag_apply(spark, v_old, dv)

    pts2 = _bag_apply(spark, pts, dpts)
    iv2 = _bag_apply(spark, iv, div)
    recomputed = range_join(pts2, iv2, "pt", "lo", "hi", bin_width=50.0, how="left")

    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, recomputed.collect()))
    assert got == want
    # sanity on the planted transitions
    by_pid = {}
    for r in merged.collect():
        by_pid.setdefault(r["pid"], set()).add(r["band"])
    assert by_pid[2] == {None}      # band deleted under it
    assert by_pid[6] == {None}      # inserted, unmatched
    assert by_pid[4] == {"hi"}      # gained a band: NULL row gone
    assert 3 not in by_pid          # deleted point
    assert by_pid[7] == {"hi"}      # inserted at the same pt as pid 4


def test_range_left_join_delta_single_side(spark):
    # delta on only one side at a time must also satisfy the invariant
    from ivm_extension_spark.operators.rangejoin import (
        range_join,
        range_left_join_delta,
    )

    m = "_duckdb_ivm_multiplicity"
    pts = spark.createDataFrame([(1, 10.0), (2, 60.0)], "pid long, pt double")
    iv = spark.createDataFrame(
        [("lo", 0.0, 50.0)], "band string, lo double, hi double"
    )
    dpts = spark.createDataFrame(
        [(3, 20.0, True), (2, 60.0, False)], f"pid long, pt double, {m} boolean"
    )
    dv = range_left_join_delta(pts, iv, dpts, None, "pt", "lo", "hi", bin_width=25.0)
    merged = _bag_apply(
        spark, range_join(pts, iv, "pt", "lo", "hi", 25.0, how="left"), dv
    )
    rec = range_join(
        _bag_apply(spark, pts, dpts), iv, "pt", "lo", "hi", 25.0, how="left"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rec.collect()))

    div = spark.createDataFrame(
        [("lo", 0.0, 50.0, False), ("all", 0.0, 100.0, True)],
        f"band string, lo double, hi double, {m} boolean",
    )
    dv2 = range_left_join_delta(pts, iv, None, div, "pt", "lo", "hi", bin_width=25.0)
    merged2 = _bag_apply(
        spark, range_join(pts, iv, "pt", "lo", "hi", 25.0, how="left"), dv2
    )
    rec2 = range_join(
        pts, _bag_apply(spark, iv, div), "pt", "lo", "hi", 25.0, how="left"
    )
    assert sorted(map(tuple, merged2.collect())) == sorted(map(tuple, rec2.collect()))


def test_range_left_join_delta_duplicate_point_values(spark):
    """Several point rows sharing the same value must not multiply the
    per-key Δ-match count: deleting ONE of three intervals that all
    cover the shared value changes each point's count 3 → 2 — no NULL
    pad, only the deleted interval's rows retract (round-2 fix)."""
    from pyspark.sql import functions as F

    from ivm_extension_spark.operators.rangejoin import (
        range_join,
        range_left_join_delta,
    )
    from ivm_extension_spark.operators.rewrite import MULT_COL

    P = spark.createDataFrame(
        [(i, 0.0) for i in range(6)], "pid long, pt double"
    )
    I = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 0.0, 0.0), (2, 0.0, 0.0)],
        "iid long, lo double, hi double",
    )
    dI = spark.createDataFrame(
        [(1, 0.0, 0.0, False)], f"iid long, lo double, hi double, {MULT_COL} boolean"
    )
    dv = range_left_join_delta(P, I, None, dI, "pt", "lo", "hi", bin_width=13.0)
    got = sorted(tuple(r) for r in dv.collect())
    # exactly the 6 retractions of interval 1 — no NULL-pad flips
    assert got == [(i, 0.0, 1, 0.0, 0.0, False) for i in range(6)]

    v_old = range_join(P, I, "pt", "lo", "hi", 13.0, how="left")
    cols = v_old.columns
    merged = (
        v_old.withColumn("__s", F.lit(1))
        .unionByName(
            dv.withColumn(
                "__s", F.when(F.col(MULT_COL), F.lit(1)).otherwise(F.lit(-1))
            ).drop(MULT_COL)
        )
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(*cols, F.explode(F.expr("sequence(1, __n)")).alias("__i"))
        .drop("__i")
    )
    I2 = I.filter("iid <> 1")
    recomputed = range_join(P, I2, "pt", "lo", "hi", 13.0, how="left")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, recomputed.collect())
    )
