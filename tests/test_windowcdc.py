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
    # multi-list in a PLAIN view is FUSED by the engine BEFORE
    # parse (split_window_stages); the single-ViewDef parser itself
    # still rejects, pointing at the cascade path
    with pytest.raises(NotImplementedError, match="fused only"):
        parse_view_sql(
            "v",
            "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts) AS a, "
            "sum(v) OVER (PARTITION BY ts ORDER BY k) AS b FROM t",
        )
    from ivm_extension_spark.plans.sqlfront import split_window_stages

    staged = split_window_stages(
        "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts) AS a, "
        "sum(v) OVER (PARTITION BY ts ORDER BY k) AS b FROM t"
    )
    assert staged is not None and staged[3] == [("k",), ("ts",)]
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

    # two lists within ONE select item cannot be cascade-split (the
    # item's expression would need rewriting) — rejected at both layers
    from ivm_extension_spark.plans.sqlfront import split_window_stages

    with pytest.raises(NotImplementedError, match="ONE select item"):
        split_window_stages(
            "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts) "
            "/ sum(w) OVER (PARTITION BY g ORDER BY ts) AS ratio FROM t"
        )
    with pytest.raises(NotImplementedError, match="fused only"):
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


# --------------------------------------------------------------------------
# multi-PARTITION-BY window views: one view with several distinct OVER
# (PARTITION BY ...) lists is maintained as a single FUSED unit (round 8,
# windowcdc.multi_window_view_delta — previously a cascade of per-list
# intermediate IMMVs) instead of being rejected
# --------------------------------------------------------------------------

_MULTI_SQL = (
    "SELECT k, g, rid, "
    "sum(v) OVER (PARTITION BY k ORDER BY ts, rid "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_v, "
    "row_number() OVER (PARTITION BY g ORDER BY v DESC, rid) AS g_rank "
    "FROM t WHERE v >= 0"
)


def _multi_fixture(spark):
    from ivm_extension_spark import IVMEngine

    base = spark.createDataFrame(
        [("a", "x", 1, 1, 10), ("a", "y", 2, 2, 20), ("a", "x", 3, 3, 30),
         ("b", "x", 1, 4, 5), ("b", "y", 2, 5, 7), ("c", "y", 9, 6, 1)],
        "k string, g string, ts int, rid int, v int",
    )
    eng = IVMEngine(spark)
    eng.register_table("t", base)
    eng.create_immv("w2", sql=_MULTI_SQL)
    return eng


def _recompute(eng):
    eng.table("t").createOrReplaceTempView("__t_now")
    return sorted(
        tuple(r)
        for r in eng.spark.sql(_MULTI_SQL.replace("FROM t", "FROM __t_now")).collect()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_multi_partition_window_view_two_batches(spark):
    eng = _multi_fixture(spark)
    assert eng.view("w2").window_lists == (("k",), ("g",))
    assert eng.view("w2").window_partition == ()

    # batch 1: insert into a/x (shifts a's running totals AND x's ranks),
    # delete b's first row (shifts b and x)
    d1 = spark.createDataFrame(
        [("a", "x", 2, 7, 15, True), ("b", "x", 1, 4, 5, False)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d1)
    eng.ivm_upsert("w2")
    got = _rows(eng.merge_view("w2"))
    eng.apply_delta("t")
    assert got == _recompute(eng)

    # batch 2 (exercises the advanced intermediate snapshots): touch a
    # NEW g-partition and delete from c
    d2 = spark.createDataFrame(
        [("c", "z", 10, 8, 3, True), ("c", "y", 9, 6, 1, False)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d2)
    eng.ivm_upsert("w2")
    got = _rows(eng.merge_view("w2"))
    eng.apply_delta("t")
    assert got == _recompute(eng)


def test_multi_partition_window_view_where_prunes(spark):
    """Rows failing the WHERE must neither appear nor mark partitions
    affected (the filter applies at stage 0, pre-window)."""
    eng = _multi_fixture(spark)
    d = spark.createDataFrame(
        [("a", "x", 5, 9, -4, True)],  # fails v >= 0
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d)
    dv = eng.ivm_upsert("w2")
    assert dv.count() == 0
    got = _rows(eng.merge_view("w2"))
    eng.apply_delta("t")
    assert got == _recompute(eng)


def test_multi_partition_window_view_save_load(spark, tmp_path):
    """window_lists survives persistence (same class of bug as the r6
    window_partition round-trip loss)."""
    from ivm_extension_spark import IVMEngine

    eng = _multi_fixture(spark)
    d1 = spark.createDataFrame(
        [("a", "x", 2, 7, 15, True)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d1)
    eng.ivm_upsert("w2")
    eng.merge_view("w2")
    eng.apply_delta("t")

    path = str(tmp_path / "store_w2")
    eng.save(path)
    b = IVMEngine.load(spark, path, tables={"t": eng.table("t")})
    assert b.view("w2").window_lists == (("k",), ("g",))
    assert _rows(b.read_view("w2")) == _rows(eng.read_view("w2"))

    d2 = spark.createDataFrame(
        [("b", "y", 3, 9, 2, True)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    b.register_delta("t", d2)
    b.ivm_upsert("w2")
    got = _rows(b.merge_view("w2"))
    b.apply_delta("t")
    assert got == _recompute(b)


def test_maintain_verbs_drive_window_cascade(spark):
    """maintain()/maintain_all() must advance an auto-split cascade
    whole (inner stages + CDC handoff + snapshot folds) — not merge the
    inner stage alone and leave the outer stale."""
    eng = _multi_fixture(spark)
    d1 = spark.createDataFrame(
        [("a", "x", 2, 7, 15, True), ("b", "x", 1, 4, 5, False)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d1)
    out = eng.maintain_all()
    assert "w2" in out and "__w2_w0" not in out
    assert _rows(eng.read_view("w2")) == _recompute(eng)

    d2 = spark.createDataFrame(
        [("c", "z", 10, 8, 3, True)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d2)
    got = _rows(eng.maintain("w2"))
    assert got == _recompute(eng)


def test_multi_partition_window_cascade_randomized_batches(spark):
    """Seeded randomized THREE-batch drive of the auto-split cascade:
    inserts of new rows and deletes of live ones, partitions appearing
    and dying, matching a full recompute after every batch."""
    import random

    from ivm_extension_spark import IVMEngine

    rng = random.Random(1234)
    rows_, rid = [], 0
    for k in "abcd":
        for _ in range(rng.randint(2, 6)):
            rows_.append(
                (k, "xyz"[rng.randint(0, 2)], rng.randint(0, 5), rid, rng.randint(0, 9))
            )
            rid += 1
    base = spark.createDataFrame(rows_, "k string, g string, ts int, rid int, v int")
    eng = IVMEngine(spark)
    eng.register_table("t", base)
    eng.create_immv("w2", sql=_MULTI_SQL)

    live = list(rows_)
    next_rid = 100
    for batch in range(3):
        dels = [r + (False,) for r in rng.sample(live, min(3, len(live)))]
        ins = [
            ("abcde"[rng.randint(0, 4)], "xyzw"[rng.randint(0, 3)],
             rng.randint(0, 5), next_rid + j, rng.randint(0, 9), True)
            for j in range(rng.randint(1, 4))
        ]
        next_rid += 10
        delta = spark.createDataFrame(
            dels + ins, f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean"
        )
        eng.register_delta("t", delta)
        eng.ivm_upsert("w2")
        got = _rows(eng.merge_view("w2"))
        eng.apply_delta("t")
        assert got == _recompute(eng), f"batch {batch} diverged"
        dead = {d[:5] for d in dels}
        live = [r for r in live if r not in dead] + [i[:5] for i in ins]


def test_multilist_review_fixes(spark):
    """Round-7 review pins: (a) unaliased window items in a multi-list
    view are rejected (the cascade carries windows by column NAME; an
    expression-text alias would re-evaluate the window over the wrong
    partition subset — silently wrong); (b) ivm_upsert is idempotent
    per delta batch (preview + maintain must not double-apply);
    (c) drop_view removes the whole cascade, inner stages included."""
    import pytest

    from ivm_extension_spark import IVMEngine
    from ivm_extension_spark.plans.sqlfront import split_window_stages

    with pytest.raises(NotImplementedError, match="AS alias"):
        split_window_stages(
            "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts, rid), "
            "row_number() OVER (PARTITION BY g ORDER BY v, rid) AS r FROM t"
        )

    eng = _multi_fixture(spark)
    d1 = spark.createDataFrame(
        [("a", "x", 2, 7, 15, True), ("b", "x", 1, 4, 5, False)],
        f"k string, g string, ts int, rid int, v int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d1)
    eng.ivm_upsert("w2")   # preview ΔV
    got = _rows(eng.maintain("w2"))  # re-upserts internally: must NOT double-apply
    assert got == _recompute(eng)

    eng.drop_view("w2")
    assert "w2" not in eng.list_views()
    assert "__w2_w0" not in eng.list_views()
    eng.drop_table("t")  # no orphaned inner view blocks the base table


def test_sqlfront_window_routing_review_pins(spark):
    """Round-9 review pins on the window/aggregate routing seams:
    (a) a bare aggregate mixed with multi-list windows must NOT take
    the fused multi-list path (which would die later in Spark with an
    opaque mixed-aggregate AnalysisException) — split_window_stages
    falls through and the view routes/rejects via parse_view_sql;
    (b) aggregate detection is quote-aware: the word 'over' inside a
    string literal does not turn count(...) into a window item, so the
    view routes to the aggregate/read-window path it was meant for."""
    from ivm_extension_spark.plans.sqlfront import (
        parse_view_sql,
        split_window_stages,
    )

    # (a) bare aggregate + two partition lists → None (fall through),
    # never the fused path
    assert (
        split_window_stages(
            "SELECT sum(v) AS s, "
            "sum(v) OVER (PARTITION BY a ORDER BY ts, rid) AS ra, "
            "sum(v) OVER (PARTITION BY b ORDER BY ts, rid) AS rb FROM t"
        )
        is None
    )

    # (b) 'over' inside a literal: the count is an aggregate, the view
    # is an aggregate view, and its companion window lands in
    # read_windows (not window_partition)
    vdef = parse_view_sql(
        "v",
        "SELECT status, "
        "count(CASE WHEN note = 'rolled over' THEN 1 END) AS n_roll, "
        "sum(v) AS s, "
        "rank() OVER (ORDER BY s DESC, status ASC) AS rnk "
        "FROM t GROUP BY status",
    )
    assert vdef.read_windows and not vdef.window_partition

    # same quote-awareness with NO group by: the aggregate alone must
    # still mark the view aggregate so the global window is accepted
    vdef2 = parse_view_sql(
        "v2",
        "SELECT count(CASE WHEN note = 'rolled over' THEN 1 END) AS n_roll, "
        "rank() OVER (ORDER BY n_roll DESC) AS rnk FROM t",
    )
    assert vdef2.read_windows and not vdef2.window_partition


# --------------------------------------------------------------------------
# read-windows (round 8): window expressions — GLOBAL ones included — in
# the select list of an AGGREGATE view, recomputed on read over the
# merged state (ViewDef.read_windows; merge.finalize)
# --------------------------------------------------------------------------

_GW_SQL = (
    "SELECT cust, sum(cents) AS rev, count(oid) AS n, "
    "rank() OVER (ORDER BY rev DESC, cust ASC) AS rnk "
    "FROM t GROUP BY cust HAVING rev > 50"
)


def _gw_fixture(spark):
    from ivm_extension_spark import IVMEngine

    base = spark.createDataFrame(
        [(i, f"c{i % 7}", (i * 37) % 90) for i in range(60)],
        "oid int, cust string, cents long",
    )
    eng = IVMEngine(spark)
    eng.register_table("t", base)
    eng.create_immv("gw", sql=_GW_SQL)
    return eng


def _gw_recompute(eng):
    eng.table("t").createOrReplaceTempView("__gw_now")
    return sorted(
        tuple(r)
        for r in eng.spark.sql(
            "SELECT cust, rev, n, rank() OVER (ORDER BY rev DESC, cust ASC) "
            "AS rnk FROM (SELECT cust, sum(cents) AS rev, count(oid) AS n "
            "FROM __gw_now GROUP BY cust HAVING sum(cents) > 50)"
        ).collect()
    )


def test_global_read_window_two_batches(spark):
    """A global rank over a maintained aggregate matches a recompute
    across insert+delete batches; ΔV and state never carry the rank."""
    eng = _gw_fixture(spark)
    vdef = eng.view("gw")
    assert vdef.read_windows and "rnk" not in vdef.output_order
    assert tuple(vdef.public_order) == ("cust", "rev", "n", "rnk")
    assert _rows(eng.read_view("gw")) == _gw_recompute(eng)
    for batch in (
        [(100, "c1", 500, True), (8, "c1", (8 * 37) % 90, False)],
        [(200, "znew", 77, True), (100, "c1", 500, False)],
    ):
        d = spark.createDataFrame(
            batch, f"oid int, cust string, cents long, {MULT_COL} boolean"
        )
        eng.register_delta("t", d)
        dv = eng.ivm_upsert("gw")
        assert "rnk" not in dv.columns
        got = _rows(eng.merge_view("gw"))
        eng.apply_delta("t")
        assert got == _gw_recompute(eng)


def test_read_window_save_load_and_guards(spark, tmp_path):
    from ivm_extension_spark import IVMEngine
    from ivm_extension_spark.operators.rewrite import IVMError

    eng = _gw_fixture(spark)
    path = str(tmp_path / "gw_store")
    eng.save(path)
    b = IVMEngine.load(spark, path, tables={"t": eng.table("t")})
    assert b.view("gw").read_windows == eng.view("gw").read_windows
    assert b.view("gw").public_order == eng.view("gw").public_order
    assert _rows(b.read_view("gw")) == _rows(eng.read_view("gw"))
    # CDC over a read-window view is unsound (a global rank moves
    # outside the touched groups) — rejected loudly
    d = spark.createDataFrame(
        [(300, "c2", 10, True)], f"oid int, cust string, cents long, {MULT_COL} boolean"
    )
    eng.register_delta("t", d)
    import pytest

    with pytest.raises(IVMError, match="read-windows"):
        eng.merge_view_cdc("gw")


def test_raw_table_global_window_still_rejected(spark):
    """No bounded delta region over a raw table — the rejection now
    points at the aggregate-view read-window path."""
    import pytest

    from ivm_extension_spark import IVMEngine

    eng = IVMEngine(spark)
    eng.register_table(
        "t", spark.createDataFrame([(1, 2)], "a int, b int")
    )
    with pytest.raises(NotImplementedError, match="AGGREGATE view"):
        eng.create_immv("bad", sql="SELECT a, rank() OVER (ORDER BY b) AS r FROM t")


def test_partitioned_read_window_over_agg(spark):
    """PARTITION BY windows over an aggregate view take the same
    read-window path (state stays windowless)."""
    from ivm_extension_spark import IVMEngine

    base = spark.createDataFrame(
        [(i, f"g{i % 3}", f"c{i % 5}", i % 11) for i in range(40)],
        "oid int, grp string, cust string, cents long",
    )
    eng = IVMEngine(spark)
    eng.register_table("t", base)
    eng.create_immv(
        "pw",
        sql="SELECT grp, cust, sum(cents) AS rev, "
        "row_number() OVER (PARTITION BY grp ORDER BY rev DESC, cust) AS rk "
        "FROM t GROUP BY grp, cust",
    )
    assert "rk" not in eng.view("pw").output_order
    d = spark.createDataFrame(
        [(900, "g0", "c9", 400, True)],
        f"oid int, grp string, cust string, cents long, {MULT_COL} boolean",
    )
    eng.register_delta("t", d)
    got = _rows(eng.maintain("pw"))
    eng.table("t").createOrReplaceTempView("__pw_now")
    want = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT grp, cust, rev, row_number() OVER (PARTITION BY grp "
            "ORDER BY rev DESC, cust) AS rk FROM (SELECT grp, cust, "
            "sum(cents) AS rev FROM __pw_now GROUP BY grp, cust)"
        ).collect()
    )
    assert got == want


def test_three_list_fused_window_view(spark):
    """THREE distinct PARTITION BY lists in one SQL text maintain as one
    fused view across an insert+delete batch (the closure derivation is
    per-list, nothing is 2-list-specific)."""
    from ivm_extension_spark import IVMEngine

    base = spark.createDataFrame(
        [(i, f"k{i % 4}", f"g{i % 3}", f"h{i % 2}", i % 7, i)
         for i in range(60)],
        "rid int, k string, g string, h string, v int, ts int",
    )
    eng = IVMEngine(spark)
    eng.register_table("t", base)
    sql = (
        "SELECT rid, "
        "sum(v) OVER (PARTITION BY k ORDER BY ts, rid "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a, "
        "row_number() OVER (PARTITION BY g ORDER BY v DESC, rid) AS b, "
        "max(v) OVER (PARTITION BY h) AS c "
        "FROM t"
    )
    eng.create_immv("w3", sql=sql)
    assert eng.view("w3").window_lists == (("k",), ("g",), ("h",))
    d = spark.createDataFrame(
        [(100, "k1", "g0", "h1", 99, 100, True),
         (7, "k3", "g1", "h1", 0, 7, False)],
        f"rid int, k string, g string, h string, v int, ts int, {MULT_COL} boolean",
    )
    eng.register_delta("t", d)
    got = _rows(eng.maintain("w3"))
    eng.table("t").createOrReplaceTempView("__w3_now")
    want = sorted(
        tuple(r) for r in spark.sql(sql.replace("FROM t", "FROM __w3_now")).collect()
    )
    assert got == want


def test_fused_multilist_randomized_lists_and_batches(spark):
    """Seeded randomized drive of the FUSED multi-list rule: random
    number of lists (2-3), random inserts of new rows and deletes of
    live ones across two batches, each compared against a recompute
    over the advanced base."""
    import random

    from ivm_extension_spark import IVMEngine

    rng = random.Random(4321)
    for trial in range(3):
        n_lists = rng.randint(2, 3)
        rows_, rid = [], 0
        for _ in range(rng.randint(25, 45)):
            rows_.append(
                (rid, f"k{rng.randint(0, 3)}", f"g{rng.randint(0, 2)}",
                 f"h{rng.randint(0, 1)}", rng.randint(0, 9), rng.randint(0, 5))
            )
            rid += 1
        base = spark.createDataFrame(
            rows_, "rid int, k string, g string, h string, v int, ts int"
        )
        items = [
            "sum(v) OVER (PARTITION BY k ORDER BY ts, rid "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a",
            "row_number() OVER (PARTITION BY g ORDER BY v DESC, rid) AS b",
            "max(v) OVER (PARTITION BY h) AS c",
        ][:n_lists]
        sql = "SELECT rid, " + ", ".join(items) + " FROM t"
        eng = IVMEngine(spark)
        eng.register_table("t", base)
        eng.create_immv("w", sql=sql)
        assert len(eng.view("w").window_lists) == n_lists
        live = list(rows_)
        nxt = 1000
        for _ in range(2):
            dels = [r + (False,) for r in rng.sample(live, min(2, len(live)))]
            ins = [
                (nxt + j, f"k{rng.randint(0, 4)}", f"g{rng.randint(0, 3)}",
                 f"h{rng.randint(0, 1)}", rng.randint(0, 9), rng.randint(0, 5), True)
                for j in range(rng.randint(1, 3))
            ]
            nxt += 10
            eng.register_delta(
                "t",
                spark.createDataFrame(
                    dels + ins,
                    f"rid int, k string, g string, h string, v int, ts int, {MULT_COL} boolean",
                ),
            )
            got = _rows(eng.maintain("w"))
            eng.table("t").createOrReplaceTempView("__wf_now")
            want = sorted(
                tuple(r)
                for r in spark.sql(sql.replace("FROM t", "FROM __wf_now")).collect()
            )
            assert got == want, f"trial {trial} ({n_lists} lists) diverged"
            dead = {d[:6] for d in dels}
            live = [r for r in live if r not in dead] + [i[:6] for i in ins]


# --------------------------------------------------------------------------
# window-over-join composites (round 9): the engine auto-assembles the
# inner-join-view + snapshot + window-view cascade from one CREATE IMMV
# --------------------------------------------------------------------------


def _wj_engine(spark):
    from ivm_extension_spark import IVMEngine

    eng = IVMEngine(spark)
    eng.register_table(
        "o",
        spark.createDataFrame(
            [(1, 10, 100), (2, 10, 50), (3, 20, 70), (4, 20, 90), (5, 30, 30)],
            "oid int, ckey int, cents int",
        ),
    )
    eng.register_table(
        "c",
        spark.createDataFrame(
            [(10, "gold"), (20, "silver"), (30, "gold")], "ckey int, seg string"
        ),
    )
    return eng


def _wj_recompute(eng, exprs="rank"):
    o, c = eng.table("o"), eng.table("c")
    j = o.join(c, "ckey")
    w = Window.partitionBy("seg").orderBy(F.col("cents").desc(), F.col("oid").asc())
    return sorted(
        map(
            tuple,
            j.select(
                "oid", "seg", "cents", F.rank().over(w).alias("rnk")
            ).collect(),
        )
    )


_WJ_SQL = (
    "SELECT oid, seg, cents, "
    "rank() OVER (PARTITION BY seg ORDER BY cents DESC, oid ASC) AS rnk "
    "FROM o JOIN c ON o.ckey = c.ckey"
)


def test_window_over_join_lifecycle(spark):
    """create → upsert (pure preview) → maintain over fact AND dim
    deltas equals a full recompute; the cascade is engine-owned (inner
    view + snapshot appear, drop removes all three)."""
    eng = _wj_engine(spark)
    got0 = sorted(map(tuple, eng.create_immv("w", sql=_WJ_SQL).collect()))
    assert got0 == _wj_recompute(eng)
    assert "__w_j" in eng.list_views() and "__w_snap" in eng.list_tables()

    # fact-side batch: preview must not advance ANY state
    eng.register_delta(
        "o",
        spark.createDataFrame(
            [(6, 30, 999, True), (3, 20, 70, False)],
            f"oid int, ckey int, cents int, {MULT_COL} boolean",
        ),
    )
    dv = eng.ivm_upsert("w")
    assert any(r[MULT_COL] for r in dv.collect())
    assert sorted(map(tuple, eng.read_view("w").collect())) == got0
    assert eng._merge_counts.get("__w_j", 0) == 0
    out = sorted(map(tuple, eng.maintain("w").collect()))
    assert out == _wj_recompute(eng)

    # dim-side batch (reseats every order of the touched segment)
    eng.register_delta(
        "c",
        spark.createDataFrame(
            [(20, "silver", False), (20, "gold", True)],
            f"ckey int, seg string, {MULT_COL} boolean",
        ),
    )
    res = eng.maintain_all()
    assert set(res) == {"w"}
    assert sorted(map(tuple, eng.read_view("w").collect())) == _wj_recompute(eng)

    # drop removes the whole cascade and unblocks the base tables
    eng.drop_view("w")
    assert eng.list_views() == [] and "__w_snap" not in eng.list_tables()
    eng.drop_table("o")


def test_window_over_join_where_and_pruning(spark):
    """The WHERE lives in the inner view (SQL: WHERE before windows), so
    filtered-out rows never reach the snapshot or the rank; the inner
    carries only referenced columns (pruned against base schemas)."""
    eng = _wj_engine(spark)
    eng.create_immv(
        "w",
        sql=(
            "SELECT oid, seg, "
            "row_number() OVER (PARTITION BY seg ORDER BY cents DESC, oid ASC) AS rn "
            "FROM o JOIN c ON o.ckey = c.ckey WHERE cents >= 50"
        ),
    )
    # pruned inner: oid/seg/cents referenced; ckey only in ON → inner
    # output is exactly the referenced set
    assert set(eng.view("__w_j").output_order) == {"oid", "seg", "cents"}
    eng.register_delta(
        "o",
        spark.createDataFrame(
            [(6, 10, 49, True), (7, 10, 60, True)],
            f"oid int, ckey int, cents int, {MULT_COL} boolean",
        ),
    )
    eng.maintain("w")
    got = sorted(map(tuple, eng.read_view("w").collect()))
    j = eng.table("o").join(eng.table("c"), "ckey").filter("cents >= 50")
    w = Window.partitionBy("seg").orderBy(F.col("cents").desc(), F.col("oid").asc())
    exp = sorted(
        map(tuple, j.select("oid", "seg", F.row_number().over(w).alias("rn")).collect())
    )
    assert got == exp
    assert not any(r[0] == 6 for r in got)  # filtered insert never ranked


def test_window_over_join_multilist_fused(spark):
    """Two PARTITION BY lists over a join: the outer routes through the
    FUSED multi-list path, composed over the same snapshot.  (The
    partition columns must be unambiguous in the join output — ckey
    exists on both sides, so the second list uses cents' bucket.)"""
    eng = _wj_engine(spark)
    eng.create_immv(
        "w2",
        sql=(
            "SELECT oid, seg, cents, "
            "rank() OVER (PARTITION BY seg ORDER BY cents DESC, oid ASC) AS seg_rnk, "
            "rank() OVER (PARTITION BY cents ORDER BY oid ASC) AS cents_rnk "
            "FROM o JOIN c ON o.ckey = c.ckey"
        ),
    )
    assert eng.view("w2").window_lists  # fused multi-list outer
    eng.register_delta(
        "o",
        spark.createDataFrame(
            [(6, 20, 95, True), (1, 10, 100, False)],
            f"oid int, ckey int, cents int, {MULT_COL} boolean",
        ),
    )
    eng.maintain("w2")
    j = eng.table("o").join(eng.table("c"), "ckey")
    ws = Window.partitionBy("seg").orderBy(F.col("cents").desc(), F.col("oid").asc())
    wc = Window.partitionBy("cents").orderBy(F.col("oid").asc())
    exp = sorted(
        map(
            tuple,
            j.select(
                "oid",
                "seg",
                "cents",
                F.rank().over(ws).alias("seg_rnk"),
                F.rank().over(wc).alias("cents_rnk"),
            ).collect(),
        )
    )
    assert sorted(map(tuple, eng.read_view("w2").collect())) == exp


def test_window_over_join_save_load(spark, tmp_path):
    """Composite persistence: the snapshot is rebuilt from the saved
    inner state (never passed in tables=); the reloaded composite keeps
    maintaining."""
    from ivm_extension_spark import IVMEngine

    eng = _wj_engine(spark)
    eng.create_immv("w", sql=_WJ_SQL)
    eng.register_delta(
        "o",
        spark.createDataFrame(
            [(6, 30, 999, True)], f"oid int, ckey int, cents int, {MULT_COL} boolean"
        ),
    )
    eng.maintain("w")
    path = str(tmp_path / "sav")
    eng.save(path)
    b = IVMEngine.load(
        spark, path, tables={"o": eng.table("o"), "c": eng.table("c")}
    )
    assert sorted(map(tuple, b.read_view("w").collect())) == _wj_recompute(eng)
    b.register_delta(
        "o",
        spark.createDataFrame(
            [(2, 10, 50, False)], f"oid int, ckey int, cents int, {MULT_COL} boolean"
        ),
    )
    b.maintain("w")
    assert sorted(map(tuple, b.read_view("w").collect())) == _wj_recompute(b)


def test_window_over_join_rejections(spark):
    """aggregate+window+join does NOT compose (windows there evaluate
    AFTER GROUP BY — it routes to the read-window aggregate path, the
    correct SQL semantics), and a failed composite outer leaves no
    dangling inner/snapshot."""
    import pytest

    eng = _wj_engine(spark)
    # GROUP BY + window + join → read-window aggregate view, not a
    # composite (rank over the aggregated rows, per SQL evaluation order)
    eng.create_immv(
        "agg_rnk",
        sql=(
            "SELECT seg, sum(cents) AS s, "
            "rank() OVER (ORDER BY s DESC, seg ASC) AS r "
            "FROM o JOIN c ON o.ckey = c.ckey GROUP BY seg"
        ),
    )
    assert eng.view("agg_rnk").read_windows and "agg_rnk" not in eng._composites
    got = sorted(map(tuple, eng.read_view("agg_rnk").collect()))
    assert got == [("gold", 180, 1), ("silver", 160, 2)]
    eng.drop_view("agg_rnk")
    # global window over a join → outer (raw-table global window)
    # rejection propagates AND cleans up the half-built cascade
    with pytest.raises(NotImplementedError):
        eng.create_immv(
            "bad2",
            sql=(
                "SELECT oid, rank() OVER (ORDER BY cents DESC) AS r "
                "FROM o JOIN c ON o.ckey = c.ckey"
            ),
        )
    assert eng.list_views() == []
    assert "__bad2_snap" not in eng.list_tables()


def test_window_over_join_streaming_drive(spark, tmp_path):
    """The two round-9 features COMPOSE: StreamingViewMaintainer drives a
    composite window-over-join view from fact-side CDC micro-batches —
    each batch runs the same upsert (Δsnap preview) → merge (outer, then
    inner+snapshot advance) → apply_delta loop, and the final state
    equals the full recompute over the post-stream world."""
    from ivm_extension_spark.streaming import StreamingViewMaintainer

    eng = _wj_engine(spark)
    eng.create_immv("w", sql=_WJ_SQL)

    delta_dir = str(tmp_path / "deltas")
    sch = f"oid int, ckey int, cents int, {MULT_COL} boolean"
    # batch 1: insert a new top order for silver, delete gold's cheapest;
    # batch 2: insert into the previously-unseen ckey 30 (gold)
    spark.createDataFrame(
        [(6, 20, 95, True), (2, 10, 50, False)], sch
    ).write.parquet(f"{delta_dir}/b1")
    spark.createDataFrame([(7, 30, 120, True)], sch).write.parquet(
        f"{delta_dir}/b2"
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{delta_dir}/*")
    )
    m = StreamingViewMaintainer(eng, "w", "o")
    q = m.start(stream, checkpoint_dir=str(tmp_path / "ckpt"))
    assert q.awaitTermination(180)
    assert m.batches_applied >= 2
    assert sorted(map(tuple, eng.read_view("w").collect())) == _wj_recompute(eng)
    # the cascade advanced under the stream: snapshot equals the live join
    snap_df = eng.table("__w_snap")
    snap = sorted(map(tuple, snap_df.collect()))
    j = eng.table("o").join(eng.table("c"), "ckey").select(*snap_df.columns)
    assert snap == sorted(map(tuple, j.collect()))


def test_bag_diff_cdc_equals_two_exceptalls(spark):
    """The fused ±1 aggregation (merge.bag_diff_cdc) must produce the
    exact multiset of the two-exceptAll formulation it replaced —
    duplicates replicated, NULLs grouped, both multiplicity signs."""
    from ivm_extension_spark.operators.merge import bag_diff_cdc

    old = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2), (None, 3), ("c", None)],
        "k string, v int",
    )
    new = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 2), (None, 3), ("d", 4), ("c", None)],
        "k string, v int",
    )
    got = sorted(map(tuple, bag_diff_cdc(old, new, MULT_COL).collect()))
    ins = new.exceptAll(old).withColumn(MULT_COL, F.lit(True))
    dels = old.exceptAll(new).withColumn(MULT_COL, F.lit(False))
    want = sorted(map(tuple, ins.unionByName(dels).collect()))
    assert got == want
    # identical sides -> empty CDC
    assert bag_diff_cdc(old, old, MULT_COL).count() == 0
