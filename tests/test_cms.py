"""Count-Min sketch (functions/cms.py): overestimate-only guarantee,
linearity under deletes, merge ≡ union, NULL handling, and the
single-shuffle sketch plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.functions import cms


@pytest.fixture(scope="module")
def zipfish(spark):
    # skewed multiset: value v appears ~ 600 // (v + 1) times
    rows = [(v,) for v in range(40) for _ in range(600 // (v + 1))]
    rows.append((None,))
    return spark.createDataFrame(rows, "v int")


def test_estimate_never_underestimates(spark, zipfish):
    exact = {
        r["v"]: r["n"]
        for r in zipfish.filter("v IS NOT NULL")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sk = cms.cms_sketch(zipfish, (), "v", d=4, w=256)
    items = zipfish.filter("v IS NOT NULL").select("v").distinct()
    est = {
        r["v"]: r["est_count"]
        for r in cms.cms_estimate(sk, items, (), "v", d=4, w=256).collect()
    }
    assert set(est) == set(exact)
    n = sum(exact.values())
    for v, e in est.items():
        assert e >= exact[v], (v, e, exact[v])
        # CMS bound: err <= e*N/w with prob 1-e^-d; deterministic data,
        # assert the bound with slack 2x
        assert e - exact[v] <= 2 * 2.718281828 * n / 256, (v, e, exact[v])


def test_deletes_cancel_exactly(spark, zipfish):
    base = zipfish.filter("v IS NOT NULL")
    plus = cms.cms_sketch(base, (), "v", d=4, w=256)
    minus = cms.cms_sketch(base, (), "v", d=4, w=256, weight="-1")
    assert cms.cms_merge(plus, minus, ()).count() == 0


def test_merge_equals_union_sketch(spark, zipfish):
    a = zipfish.filter("v IS NOT NULL AND v < 20")
    b = zipfish.filter("v IS NOT NULL AND v >= 20")
    merged = cms.cms_merge(
        cms.cms_sketch(a, (), "v", d=4, w=256),
        cms.cms_sketch(b, (), "v", d=4, w=256),
        (),
    )
    whole = cms.cms_sketch(a.unionByName(b), (), "v", d=4, w=256)
    key = lambda r: (r["row_j"], r["bucket"], r["c"])  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, whole.collect())
    )


def test_partial_delete_tracks_exactly_for_watched_key(spark, zipfish):
    # delete 3 of the v=0 rows; the v=0 estimate must drop by exactly 3
    # (collision mass is identical before/after — linearity)
    base = zipfish.filter("v IS NOT NULL")
    sk = cms.cms_sketch(base, (), "v", d=4, w=256)
    dlt = cms.cms_sketch(
        spark.createDataFrame([(0,), (0,), (0,)], "v int"),
        (),
        "v",
        d=4,
        w=256,
        weight="-1",
    )
    items = spark.createDataFrame([(0,)], "v int")
    before = cms.cms_estimate(sk, items, (), "v", d=4, w=256).collect()[0][
        "est_count"
    ]
    after = cms.cms_estimate(
        cms.cms_merge(sk, dlt, ()), items, (), "v", d=4, w=256
    ).collect()[0]["est_count"]
    assert after == before - 3


def test_grouped_sketch_keys_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("b", 1)] * 2, "g string, v int"
    )
    sk = cms.cms_sketch(df, ("g",), "v", d=2, w=64)
    items = df.select("g", "v").distinct()
    est = {
        (r["g"], r["v"]): r["est_count"]
        for r in cms.cms_estimate(sk, items, ("g",), "v", d=2, w=64).collect()
    }
    assert est[("a", 1)] == 5 and est[("b", 1)] == 2


def test_sketch_plan_is_one_shuffle_with_partial_agg(spark, zipfish):
    plan = (
        cms.cms_sketch(zipfish, (), "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "partial_sum" in plan or "HashAggregate" in plan, plan
