"""Histogram quantile sketch (functions/quantiles.py): linearity under
deletes, rank edge cases, and the bounded-error contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ivm_extension_spark.functions import quantiles as qh


def test_quantile_estimate_within_half_bin(spark):
    vals = [float(v) for v in range(0, 1000, 3)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    sk = qh.hist_sketch(df, (), "x", bin_width=10.0)
    out = {
        r["p"]: r["est"]
        for r in qh.hist_quantile(sk, (), (0.0, 0.25, 0.5, 0.99, 1.0), 10.0).collect()
    }
    svals = sorted(vals)
    for p, est in out.items():
        rank = max(1, math.ceil(p * len(svals)))
        exact = svals[rank - 1]
        assert abs(est - exact) <= 5.0, (p, est, exact)


def test_merge_with_signed_delta_equals_recompute(spark):
    base = spark.createDataFrame(
        [("a", float(i % 50)) for i in range(500)]
        + [("b", float(i % 90)) for i in range(300)],
        "g string, x double",
    )
    # delete every x == 7 row of group a, insert twenty 200.0s into b
    delta = spark.createDataFrame(
        [("a", 7.0, False)] * 10 + [("b", 200.0, True)] * 20,
        "g string, x double, m boolean",
    )
    sk = qh.hist_sketch(base, ("g",), "x", 8.0)
    d_sk = qh.hist_sketch(
        delta, ("g",), "x", 8.0, weight="CASE WHEN m THEN 1 ELSE -1 END"
    )
    merged = qh.hist_merge(sk, d_sk, ("g",))
    post = base.exceptAll(
        spark.createDataFrame([("a", 7.0)] * 10, "g string, x double")
    ).unionByName(spark.createDataFrame([("b", 200.0)] * 20, "g string, x double"))
    recomputed = qh.hist_sketch(post, ("g",), "x", 8.0)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, recomputed.collect()))
    assert got == want  # linearity: merge-of-delta == sketch-of-post


def test_zeroed_bins_dropped_and_nulls_ignored(spark):
    base = spark.createDataFrame([("a", 5.0), ("a", None)], "g string, x double")
    delta = spark.createDataFrame([("a", 5.0, False)], "g string, x double, m boolean")
    sk = qh.hist_sketch(base, ("g",), "x", 1.0)
    assert sk.count() == 1  # the NULL row never entered
    d_sk = qh.hist_sketch(
        delta, ("g",), "x", 1.0, weight="CASE WHEN m THEN 1 ELSE -1 END"
    )
    assert qh.hist_merge(sk, d_sk, ("g",)).count() == 0


def test_rank_edges_p0_and_p1(spark):
    df = spark.createDataFrame([(float(v),) for v in (1, 2, 3)], "x double")
    sk = qh.hist_sketch(df, (), "x", 1.0)
    out = {r["p"]: r["est"] for r in qh.hist_quantile(sk, (), (0.0, 1.0), 1.0).collect()}
    assert out[0.0] == 1.5  # rank clamps to 1 → bin of the minimum
    assert out[1.0] == 3.5  # rank n → bin of the maximum


def test_one_shuffle_plan(spark):
    df = spark.createDataFrame([("a", float(i)) for i in range(100)], "g string, x double")
    sk = qh.hist_sketch(df, ("g",), "x", 10.0)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # map-side combine
