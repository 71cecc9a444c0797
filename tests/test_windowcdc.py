"""Maintained window views (operators/windowcdc.py): merge-equals-
recompute invariant, untouched partitions absent from the CDC."""

from pyspark.sql import Window, functions as F

from ivm_extension_spark.operators.rewrite import MULT_COL
from ivm_extension_spark.operators.windowcdc import window_view_delta


def _running(df):
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("ts").asc(), F.col("rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select("k", "ts", "rid", F.sum("v").over(w).alias("rt"))


def _rank(df):
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("rid").asc())
    return df.select("k", "rid", F.row_number().over(w).alias("rnk"))


def test_window_cdc_merge_equals_recompute(spark):
    base = spark.createDataFrame(
        [("a", 1, 1, 10), ("a", 2, 2, 20), ("a", 3, 3, 30),
         ("b", 1, 4, 5), ("b", 2, 5, 7), ("c", 9, 6, 1)],
        "k string, ts int, rid int, v int",
    )
    # insert mid-stream into a (shifts a's later running totals), delete
    # b's first row (shifts b), leave c untouched
    delta = spark.createDataFrame(
        [("a", 2, 7, 15, True), ("b", 1, 4, 5, False)],
        f"k string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    for compute in (_running, _rank):
        dv = window_view_delta(base, delta, ("k",), compute)
        v_old = [tuple(r) for r in compute(base).collect()]
        merged = list(v_old)
        for r in dv.collect():
            t = tuple(r)[:-1]
            if r[MULT_COL]:
                merged.append(t)
            else:
                merged.remove(t)
        new_base = spark.createDataFrame(
            [("a", 1, 1, 10), ("a", 2, 2, 20), ("a", 3, 3, 30),
             ("a", 2, 7, 15), ("b", 2, 5, 7), ("c", 9, 6, 1)],
            "k string, ts int, rid int, v int",
        )
        want = [tuple(r) for r in compute(new_base).collect()]
        assert sorted(merged, key=repr) == sorted(want, key=repr), compute


def test_window_cdc_untouched_partitions_absent(spark):
    base = spark.createDataFrame(
        [("a", 1, 1, 10), ("b", 1, 2, 5), ("c", 1, 3, 1)],
        "k string, ts int, rid int, v int",
    )
    delta = spark.createDataFrame(
        [("a", 2, 9, 99, True)], f"k string, ts int, rid int, v int, {MULT_COL} boolean"
    )
    dv = window_view_delta(base, delta, ("k",), _running)
    ks = {r["k"] for r in dv.collect()}
    assert ks == {"a"}  # b and c never enter the CDC


def test_window_cdc_null_partition_key(spark):
    # NULL is a real window partition; a NULL-key delta row must restrict
    # and recompute the NULL partition (null-safe semi join)
    base = spark.createDataFrame(
        [(None, 1, 1, 10), (None, 2, 2, 20), ("a", 1, 3, 5)],
        "k string, ts int, rid int, v int",
    )
    delta = spark.createDataFrame(
        [(None, 2, 2, 20, False)], f"k string, ts int, rid int, v int, {MULT_COL} boolean"
    )
    dv = window_view_delta(base, delta, ("k",), _running).collect()
    assert all(r["k"] is None for r in dv)
    dels = [r for r in dv if not r[MULT_COL]]
    assert len(dels) == 1 and dels[0]["rt"] == 30


def test_sql_front_window_view_lifecycle(spark):
    # CREATE IMMV ... OVER (PARTITION BY ...) end-to-end: parse -> route
    # (rewrite.delta_plan via viewdef.window_partition) -> bag merge ==
    # full recompute
    from ivm_extension_spark import IVMEngine

    eng = IVMEngine(spark)
    eng.register_table(
        "t",
        spark.createDataFrame(
            [("a", 1, 1, 10), ("a", 2, 2, 20), ("b", 1, 3, 5), ("c", 1, 4, 1)],
            "k string, ts int, rid int, v int",
        ),
    )
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [("a", 0, 9, 100, True), ("b", 1, 3, 5, False)],
            f"k string, ts int, rid int, v int, {MULT_COL} boolean",
        ),
    )
    eng.create_immv(
        "v",
        sql="SELECT k, rid, sum(v) OVER (PARTITION BY k ORDER BY ts, rid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt FROM t",
    )
    eng.ivm_upsert("v")
    got = sorted(tuple(r) for r in eng.merge_view("v").collect())
    eng.apply_delta("t")
    want = sorted(tuple(r) for r in eng.full_refresh("v").collect())
    assert got == want and ("a", 9, 100) in got  # new first row of a


def test_sql_front_window_view_rejections(spark):
    import pytest

    from ivm_extension_spark.plans.sqlfront import parse_view_sql

    with pytest.raises(NotImplementedError, match="PARTITION BY"):
        parse_view_sql("v", "SELECT k, sum(v) OVER (ORDER BY ts) AS rt FROM t")
    with pytest.raises(NotImplementedError, match="ONE"):
        parse_view_sql(
            "v",
            "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts) AS a, "
            "sum(v) OVER (PARTITION BY ts ORDER BY k) AS b FROM t",
        )
    with pytest.raises(NotImplementedError, match="plain columns"):
        parse_view_sql(
            "v", "SELECT sum(v) OVER (PARTITION BY k + 1 ORDER BY ts) AS a FROM t"
        )
    with pytest.raises(NotImplementedError, match="cascaded"):
        parse_view_sql(
            "v",
            "SELECT k, sum(v) OVER (PARTITION BY k ORDER BY ts) AS rt "
            "FROM t JOIN s ON k = sk",
        )


def test_sql_front_window_parse_review_pins(spark):
    # round-6 review pins: (a) two top-level OVERs in ONE item must both
    # be seen (the second used to be skipped by a scan-advance bug,
    # bypassing the shared-PARTITION-BY guard); (b) an OVER nested in an
    # outer call must be detected (it used to silently parse as a plain
    # projection, evaluating the window over the delta batch alone);
    # (c) identifiers/literals containing "over" are not windows
    import pytest

    from ivm_extension_spark.plans.sqlfront import (
        _window_partitions_of,
        parse_view_sql,
    )

    with pytest.raises(NotImplementedError, match="ONE"):
        parse_view_sql(
            "v",
            "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts) "
            "/ sum(w) OVER (PARTITION BY g ORDER BY ts) AS ratio FROM t",
        )
    v = parse_view_sql(
        "v",
        "SELECT k, rid, coalesce(sum(v) OVER (PARTITION BY k ORDER BY ts), 0)"
        " AS rt FROM t",
    )
    assert v.window_partition == ("k",)
    assert _window_partitions_of("a + over_flag") == []
    assert _window_partitions_of("'OVER (x' || col") == []


def test_window_cdc_randomized_equals_recompute(spark):
    # seeded randomized mixed deltas (inserts of new rows, deletes of
    # existing ones, multi-row partitions, ties on ts broken by rid):
    # merge == recompute for a running sum and a dense ranking
    import random

    rng = random.Random(99)
    rows, rid = [], 0
    for k in "abcdef":
        for _ in range(rng.randint(1, 8)):
            rows.append((k, rng.randint(0, 5), rid, rng.randint(-3, 9)))
            rid += 1
    base = spark.createDataFrame(rows, "k string, ts int, rid int, v int")
    dels = [r + (False,) for r in rng.sample(rows, 5)]
    ins = [
        ("abcdef"[rng.randint(0, 5)], rng.randint(0, 5), 100 + j, rng.randint(-3, 9), True)
        for j in range(6)
    ]
    delta = spark.createDataFrame(
        dels + ins, f"k string, ts int, rid int, v int, {MULT_COL} boolean"
    )
    applied = [r for r in rows if r not in {d[:4] for d in dels}] + [
        i[:4] for i in ins
    ]
    new_base = spark.createDataFrame(applied, "k string, ts int, rid int, v int")
    for compute in (_running, _rank):
        dv = window_view_delta(base, delta, ("k",), compute)
        merged = [tuple(r) for r in compute(base).collect()]
        for r in dv.collect():
            t = tuple(r)[:-1]
            if r[MULT_COL]:
                merged.append(t)
            else:
                merged.remove(t)
        want = [tuple(r) for r in compute(new_base).collect()]
        assert sorted(merged, key=repr) == sorted(want, key=repr), compute
