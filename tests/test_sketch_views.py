"""Engine-integrated sketch views (operators/sketches.py, round 7):
create_sketch_immv → ivm_upsert → merge_view must equal a full
recompute for every kind, the monotone kinds must reject deletes, and
the state must ride the lakehouse store (touched buckets only) and
survive save/load."""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import IVMError, MULT_COL

from tests.conftest import rows

SF = "/root/testdata/sf0.001"


def _orders_engine(spark, **kw):
    eng = IVMEngine(spark, **kw)
    eng.register_table("orders", f"{SF}/orders.parquet")
    return eng


def _delta(eng, pred, mult):
    d = eng.table("orders").filter(F.expr(pred)).withColumn(MULT_COL, F.expr(mult))
    eng.register_delta("orders", d)


KINDS = [
    ("bloom", dict(m_bits=1 << 10, k=3), "true"),          # insert-only delta
    ("bloom_counting", dict(m_bits=1 << 10, k=3), "o_custkey % 2 = 0"),
    ("hll", dict(p=8), "true"),
    ("cms", dict(d=3, w=64), "o_custkey % 2 = 0"),
    ("hist", dict(bin_width=50000.0), "o_custkey % 2 = 0"),
]


@pytest.mark.parametrize("kind,params,mult", KINDS, ids=[k for k, _, _ in KINDS])
def test_sketch_view_merge_equals_recompute(spark, kind, params, mult):
    eng = _orders_engine(spark)
    col = "o_custkey" if kind != "hist" else "o_totalprice"
    eng.create_sketch_immv("sk", kind, "orders", col, ("o_orderstatus",), **params)
    _delta(eng, "o_orderkey % 10 = 0", mult)
    dv = eng.ivm_upsert("sk")
    assert dv.columns  # ΔV is a real relation
    merged = rows(eng.merge_view("sk"))
    assert merged == rows(eng.read_view("sk"))
    eng.apply_delta("orders")
    want = rows(eng._sketch_specs["sk"].compute(eng.table("orders")))
    if kind == "hll":
        # max-merge of an insert-duplicating delta equals the recompute
        # because registers are monotone in the value SET
        assert merged == want
    else:
        assert merged == want
    assert merged == rows(eng.full_refresh("sk"))


def test_sketch_monotone_kinds_reject_deletes(spark):
    for kind, alt in (("bloom", "bloom_counting"), ("hll", "full_refresh")):
        eng = _orders_engine(spark)
        eng.create_sketch_immv("sk", kind, "orders", "o_custkey", p=8) \
            if kind == "hll" else eng.create_sketch_immv(
                "sk", kind, "orders", "o_custkey", m_bits=1 << 10, k=3
            )
        _delta(eng, "o_orderkey % 10 = 0", "false")
        with pytest.raises(IVMError, match=alt):
            eng.ivm_upsert("sk")


def test_sketch_view_lakehouse_store_touched_buckets(spark, tmp_path):
    from ivm_extension_spark.sources.lakehouse import LakehouseStore

    store = LakehouseStore(spark, str(tmp_path / "lake"), n_buckets=8)
    a = IVMEngine(spark, state_store=store)
    b = IVMEngine(spark)  # checkpoint-backed twin
    for eng in (a, b):
        eng.register_table("orders", f"{SF}/orders.parquet")
        eng.create_sketch_immv(
            "bc", "bloom_counting", "orders", "o_custkey",
            ("o_orderstatus",), m_bits=1 << 10, k=3,
        )
    assert store.current_version("bc") == 1
    v1_files = store.bucket_files("bc")
    # ONE inserted row → k=3 touched (status, pos) coordinates → at most
    # 3 of the 8 buckets rewritten
    ok = a.table("orders").select("o_orderkey").first()[0]
    for eng in (a, b):
        d = (
            eng.table("orders")
            .filter(F.col("o_orderkey") == F.lit(ok))
            .limit(1)
            .withColumn(MULT_COL, F.lit(True))
        )
        eng.register_delta("orders", d)
        eng.ivm_upsert("bc")
        eng.merge_view("bc")
    assert rows(a.read_view("bc")) == rows(b.read_view("bc"))
    assert store.current_version("bc") == 2
    v2_files = store.bucket_files("bc")
    changed = {k for k in v1_files if v2_files.get(k) != v1_files[k]}
    # untouched bucket files carry over between snapshots
    assert 0 < len(changed) <= 3


def test_sketch_view_save_load(spark, tmp_path):
    a = _orders_engine(spark)
    a.create_sketch_immv(
        "bc", "bloom_counting", "orders", "o_custkey",
        ("o_orderstatus",), m_bits=1 << 10, k=3,
    )
    _delta(a, "o_orderkey % 10 = 0", "o_custkey % 2 = 0")
    a.ivm_upsert("bc")
    a.merge_view("bc")
    a.apply_delta("orders")

    path = str(tmp_path / "store_sketch")
    a.save(path)
    b = IVMEngine.load(spark, path, tables={"orders": a.table("orders")})
    assert "bc" in b.list_views()
    assert rows(b.read_view("bc")) == rows(a.read_view("bc"))
    # a further delete-bearing batch through the RELOADED engine
    _delta(b, "o_orderkey % 6 = 0", "false")
    b.ivm_upsert("bc")
    got = rows(b.merge_view("bc"))
    b.apply_delta("orders")
    assert got == rows(b.full_refresh("bc"))


def test_maintain_and_maintain_all_drive_sketches(spark):
    """The batch verbs must advance sketch views like ordinary IMMVs."""
    eng = _orders_engine(spark)
    eng.create_sketch_immv(
        "bc", "bloom_counting", "orders", "o_custkey",
        ("o_orderstatus",), m_bits=1 << 10, k=3,
    )
    eng.create_immv(
        "by_status",
        sql="SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    )
    _delta(eng, "o_orderkey % 10 = 0", "o_custkey % 2 = 0")
    out = eng.maintain_all()
    assert set(out) == {"bc", "by_status"}
    # bases advanced, deltas cleared — merged sketch equals recompute
    assert rows(out["bc"]) == rows(
        eng._sketch_specs["bc"].compute(eng.table("orders"))
    )

    # single-view verb
    _delta(eng, "o_orderkey % 6 = 0", "false")
    got = rows(eng.maintain("bc"))
    assert got == rows(eng._sketch_specs["bc"].compute(eng.table("orders")))


def test_sketch_review_fixes(spark):
    """Round-7 review pins: name-collision guard, drop_view support,
    version-read rejection, unknown-name error message."""
    eng = _orders_engine(spark)
    eng.create_sketch_immv("sk", "hll", "orders", "o_custkey", p=8)
    with pytest.raises(IVMError, match="sketch"):
        eng.create_immv("sk", sql="SELECT o_orderstatus, count(*) AS n "
                                  "FROM orders GROUP BY o_orderstatus")
    with pytest.raises(IVMError, match="history"):
        eng.read_view("sk", version=99)
    eng.drop_view("sk")
    assert "sk" not in eng.list_views()
    # droppable and re-creatable
    eng.create_sketch_immv("sk", "hll", "orders", "o_custkey", p=8)
    with pytest.raises(IVMError, match="not registered"):
        eng.merge_view("no_such_view")


def test_run_sketch_stream_and_discard_delta(spark, tmp_path):
    """Stream-fed engine sketch: micro-batches advance the state through
    ivm_upsert/merge_view and are then discarded (the base is never
    consulted by a sketch merge); final state equals the batch twin over
    the whole input."""
    import pytest

    from ivm_extension_spark.streaming import run_sketch_stream

    eng = _orders_engine(spark)
    full = eng.table("orders").select("o_orderkey", "o_custkey")
    eng.register_table("orders_stream", full.limit(0))
    eng.create_sketch_immv(
        "bf", "bloom", "orders_stream", "o_custkey", m_bits=1 << 10, k=3
    )
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    full.repartition(3).write.parquet(land)
    s = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    n = run_sketch_stream(eng, "bf", s, ckpt)
    assert n >= 2
    want = rows(eng._sketch_specs["bf"].compute(full))
    assert rows(eng.read_view("bf")) == want
    # batches were discarded, not folded: the stream base stayed empty
    assert eng.table("orders_stream").count() == 0
    with pytest.raises(IVMError, match="not a sketch view"):
        run_sketch_stream(eng, "nope", s, ckpt)
    with pytest.raises(IVMError, match="does not exist"):
        eng.discard_delta("orders_stream")


def test_run_sketch_stream_cdc_deletes(spark, tmp_path):
    """CDC (retraction) stream into a LINEAR sketch (round 8): batches
    carry the bool multiplicity column and run_sketch_stream registers
    them AS-IS; signed-counter linearity makes the final counting-Bloom
    state equal the batch twin over inserts ∖ deletes.  Landing files
    are hash-partitioned by the sketch value so every retraction ships
    with its insert (the merge drops non-positive counters)."""
    from ivm_extension_spark.streaming import run_sketch_stream

    eng = _orders_engine(spark)
    full = eng.table("orders").select("o_orderkey", "o_custkey")
    cdc = full.withColumn(MULT_COL, F.lit(True)).unionByName(
        full.filter("o_orderkey % 3 = 0").withColumn(MULT_COL, F.lit(False))
    )
    eng.register_table("orders_stream", full.limit(0))
    eng.create_sketch_immv(
        "cbf", "bloom_counting", "orders_stream", "o_custkey",
        m_bits=1 << 10, k=3,
    )
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    cdc.repartition(3, "o_custkey").write.parquet(land)
    s = (
        spark.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    n = run_sketch_stream(eng, "cbf", s, ckpt)
    assert n >= 2
    want = rows(
        eng._sketch_specs["cbf"].compute(full.filter("NOT (o_orderkey % 3 = 0)"))
    )
    assert rows(eng.read_view("cbf")) == want


def test_run_sketch_stream_cdc_monotone_rejects(spark, tmp_path):
    """A delete-bearing stream batch into a MONOTONE kind (bit Bloom)
    fails loudly on the first such batch — never a silent wrong merge."""
    from ivm_extension_spark.streaming import run_sketch_stream

    eng = _orders_engine(spark)
    full = eng.table("orders").select("o_orderkey", "o_custkey")
    cdc = full.withColumn(
        MULT_COL, F.expr("o_orderkey % 3 != 0")
    )
    eng.register_table("orders_stream", full.limit(0))
    eng.create_sketch_immv(
        "bf", "bloom", "orders_stream", "o_custkey", m_bits=1 << 10, k=3
    )
    land, ckpt = str(tmp_path / "land"), str(tmp_path / "ckpt")
    cdc.repartition(2).write.parquet(land)
    s = (
        spark.readStream.schema(cdc.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    with pytest.raises(Exception, match="delete|monotone|counting"):
        run_sketch_stream(eng, "bf", s, ckpt)


def test_sketch_stats(spark):
    eng = _orders_engine(spark)
    eng.create_sketch_immv("sk", "cms", "orders", "o_custkey", d=3, w=64)
    st = eng.stats("sk")
    assert st["kind"] == "sketch:cms" and st["materialized"]
    _delta(eng, "o_orderkey % 10 = 0", "true")
    assert eng.stats("sk")["pending_deltas"] == ["orders"]
    eng.ivm_upsert("sk")
    eng.merge_view("sk")
    assert eng.stats("sk")["merges_applied"] == 1


def test_sketch_list_versions_current_only(spark):
    eng = _orders_engine(spark)
    eng.create_sketch_immv("sk", "cms", "orders", "o_custkey", d=3, w=64)
    assert eng.list_versions("sk") == [0]
    _delta(eng, "o_orderkey % 10 = 0", "true")
    eng.maintain("sk")
    assert eng.list_versions("sk") == [1]
