"""Regression tests for the second round-2 review batch (asof, rangejoin,
hll, streaming recovery, viewdef compat, merge retry safety)."""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import MULT_COL

from tests.conftest import rows


# ---------------------------------------------------------------- rangejoin

def test_range_left_join_null_columns_no_duplicates(spark):
    from ivm_extension_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame(
        [(1, 5.0, None), (2, 50.0, "x")], "pid long, pt double, note string"
    )
    ivs = spark.createDataFrame([(7, 1.0, 10.0)], "iid long, lo double, hi double")
    out = range_join(pts, ivs, "pt", "lo", "hi", 4.0, how="left").collect()
    # matched row with a NULL column must NOT also appear NULL-padded
    assert sorted((r["pid"], r["iid"]) for r in out) == [(1, 7), (2, None)]


def test_range_join_overwide_interval_raises(spark):
    from ivm_extension_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 15000.0)], "pid long, pt double")
    ivs = spark.createDataFrame(
        [(7, 0.0, 20000.0)], "iid long, lo double, hi double"
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        range_join(
            pts, ivs, "pt", "lo", "hi", 1.0, max_bins_per_interval=10_000
        ).collect()
    # widening the cap restores the (previously silently dropped) match
    ok = range_join(
        pts, ivs, "pt", "lo", "hi", 1.0, max_bins_per_interval=30_000
    ).collect()
    assert [(r["pid"], r["iid"]) for r in ok] == [(1, 7)]


def test_range_join_inverted_interval_matches_nothing(spark):
    from ivm_extension_spark.operators.rangejoin import range_join

    pts = spark.createDataFrame([(1, 5.0)], "pid long, pt double")
    ivs = spark.createDataFrame(
        [(7, 1e9, 0.0), (8, 1.0, 10.0)], "iid long, lo double, hi double"
    )
    # the inverted interval must neither blow up bin explosion nor match
    out = range_join(pts, ivs, "pt", "lo", "hi", 1.0).collect()
    assert [(r["pid"], r["iid"]) for r in out] == [(1, 8)]


# ---------------------------------------------------------------- hll

def test_hll_ignores_nulls(spark):
    from ivm_extension_spark.functions.hll import hll_distinct

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None)], "g string, v int"
    )
    got = {r["g"]: r["n_distinct_hll"] for r in hll_distinct(df, ("g",), "v").collect()}
    assert got["a"] == 2  # NULL is not a distinct value
    assert "b" not in got  # all-NULL group vanishes with the filtered rows


# ---------------------------------------------------------------- asof

def test_asof_null_right_ts_never_matches(spark):
    from ivm_extension_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 20, 1.0)], "k int, ts int, val double"
    )
    out = asof_join(left, right, ("k",), "ts", ("val",)).collect()
    # no right row with ts <= 10 exists; the NULL-ts row must not match
    assert out[0]["val"] is None and out[0]["asof_ts"] is None


def test_asof_rejects_colliding_output_names(spark):
    from ivm_extension_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10, 5.0)], "k int, ts int, price double")
    right = spark.createDataFrame([(1, 5, 1.0)], "k int, ts int, price double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ("k",), "ts", ("price",))


# ---------------------------------------------------------------- viewdef

def test_viewdef_from_dict_defaults_missing_post_v1_fields():
    from ivm_extension_spark.plans.viewdef import ViewDef

    d = {
        "name": "v",
        "source": "t",
        "select": [("a", "a")],
        "aggregates": [],
        "where": None,
        "group_by": [],
        "joins": [],
        "output_order": ["a"],
    }
    vdef = ViewDef.from_dict(d)
    assert vdef.limit is None and vdef.order_by == () and not vdef.distinct
    assert vdef.grouping_sets == () and vdef.having is None


# ---------------------------------------------------------------- engine retry

def test_merge_view_failure_is_retryable_with_aux_aggs(spark, monkeypatch):
    """A merge that fails mid-flight (after the aux advance) must leave
    the engine unchanged: the retry produces the same result as a clean
    merge — no double-advanced aux multiset."""
    from ivm_extension_spark.operators import merge as merge_ops

    eng = IVMEngine(spark)
    eng.register_table(
        "t", spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "k int, v int")
    )
    eng.create_immv(
        "v", sql="SELECT k, min(v) AS lo, count(DISTINCT v) AS nd FROM t GROUP BY k"
    )
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [(1, 1, True), (1, 10, False)], f"k int, v int, {MULT_COL} boolean"
        ),
    )
    eng.ivm_upsert("v")

    real_merge = merge_ops.merge

    def boom(*a, **kw):
        raise RuntimeError("injected merge failure")

    monkeypatch.setattr(merge_ops, "merge", boom)
    with pytest.raises(RuntimeError, match="injected"):
        eng.merge_view("v")
    monkeypatch.setattr(merge_ops, "merge", real_merge)

    merged = rows(eng.merge_view("v"))
    eng.apply_delta("t")
    assert merged == rows(eng.full_refresh("v")) == [(1, 1, 2), (2, 5, 1)]


# ---------------------------------------------------------------- streaming

def test_streaming_partial_batch_replay_not_double_applied(spark, tmp_path):
    """merge committed + base fold failed + in-process replay: the
    replay must skip the merge (flagged by batch id) and only redo the
    base fold.  The fold failure is injected through the real seam —
    ``merge_and_advance`` builds its fold plan via
    ``merge_ops.apply_delta_to_table`` and folds it in a thread, so a
    poisoned fold plan makes the checkpoint job fail AFTER the merge
    committed, which is exactly the BaseFoldError contract."""
    from ivm_extension_spark.engine import BaseFoldError
    from ivm_extension_spark.operators import merge as merge_ops
    from ivm_extension_spark.streaming.continuous import StreamingViewMaintainer

    eng = IVMEngine(spark)
    eng.register_table("t", spark.createDataFrame([(1, 10)], "k int, v int"))
    eng.create_immv("v", sql="SELECT k, sum(v) AS s FROM t GROUP BY k")
    m = StreamingViewMaintainer(eng, "v", "t")

    batch = spark.createDataFrame([(1, 5, True)], f"k int, v int, {MULT_COL} boolean")
    real_fold = merge_ops.apply_delta_to_table
    calls = {"n": 0}

    def flaky_fold(base, delta):
        out = real_fold(base, delta)
        calls["n"] += 1
        if calls["n"] == 1:
            # computing this plan raises at runtime, so the fold-side
            # localCheckpoint job fails while the merge side commits
            return out.filter(
                F.assert_true(F.lit(False), F.lit("injected fold failure")).isNull()
            )
        return out

    merge_ops.apply_delta_to_table = flaky_fold
    try:
        with pytest.raises(BaseFoldError, match="redo only the fold"):
            m._process_batch(batch, 0)
    finally:
        merge_ops.apply_delta_to_table = real_fold
    assert m._merged_batch_id == 0  # merge committed, batch not finished
    m._process_batch(batch, 0)  # foreachBatch replay
    assert m.last_batch_id == 0 and m._merged_batch_id is None
    assert rows(eng.read_view("v")) == [(1, 15)]  # applied exactly once
    assert rows(eng.full_refresh("v")) == [(1, 15)]  # base advanced once too


def test_streaming_marker_write_is_atomic(spark, tmp_path):
    """The snapshot-then-marker commit uses temp+rename; a leftover temp
    file must not confuse recovery."""
    import json

    from ivm_extension_spark.streaming.continuous import StreamingViewMaintainer

    eng = IVMEngine(spark)
    eng.register_table("t", spark.createDataFrame([(1, 10)], "k int, v int"))
    eng.create_immv("v", sql="SELECT k, sum(v) AS s FROM t GROUP BY k")
    sd = str(tmp_path / "sv")
    m = StreamingViewMaintainer(eng, "v", "t", state_dir=sd)
    batch = spark.createDataFrame([(1, 5, True)], f"k int, v int, {MULT_COL} boolean")
    m._process_batch(batch, 0)
    marker = tmp_path / "sv" / "last_batch_id.json"
    assert json.loads(marker.read_text()) == {"last_batch_id": 0}
    assert not (tmp_path / "sv" / "last_batch_id.json.tmp").exists()
    # a second maintainer over the same state_dir resumes past batch 0
    m2 = StreamingViewMaintainer(eng, "v", "t", state_dir=sd)
    assert m2.last_batch_id == 0
