"""Engine persistence: save() / load() round-trips the maintained state.

The state parquet is the internal shape (hidden companions included) so
a reloaded engine continues maintenance exactly where the saved one
stopped — including aux-state aggregates (MIN/MAX/COUNT DISTINCT under
deletes), whose value multisets are persisted and whose metadata is
re-derived from the base-table schemas on load.
"""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import MULT_COL

from tests.conftest import rows

SF = "/root/testdata/sf0.001"


def _delta(eng, t, pred, mult):
    d = eng.table(t).filter(F.expr(pred)).withColumn(MULT_COL, F.expr(mult))
    eng.register_delta(t, d)


def test_save_load_continues_maintenance(spark, tmp_path):
    a = IVMEngine(spark)
    a.register_table("orders", f"{SF}/orders.parquet")
    a.create_immv(
        "by_status",
        sql="SELECT o_orderstatus, count(*) AS n, min(o_custkey) AS mn, "
        "count(DISTINCT o_custkey) AS nd FROM orders GROUP BY o_orderstatus",
    )
    a.create_immv(
        "top_cust",
        sql="SELECT o_custkey, sum(cast(round(o_totalprice*100) as bigint)) AS cents "
        "FROM orders GROUP BY o_custkey ORDER BY cents DESC, o_custkey ASC LIMIT 7",
    )
    # batch 1: advance BOTH views through the delta, then fold it into
    # the base (maintain() alone would advance one view and leave the
    # other stale against the advanced base)
    _delta(a, "orders", "o_orderkey % 10 = 0", "o_custkey % 2 = 0")
    for v in ("by_status", "top_cust"):
        a.ivm_upsert(v)
        a.merge_view(v)
    a.apply_delta("orders")

    path = str(tmp_path / "ivm_store")
    a.save(path)

    b = IVMEngine.load(spark, path, tables={"orders": a.table("orders")})
    assert sorted(b.list_views()) == ["by_status", "top_cust"]
    assert rows(b.read_view("by_status")) == rows(a.read_view("by_status"))
    assert rows(b.read_view("top_cust")) == rows(a.read_view("top_cust"))

    # batch 2 (delete-bearing → exercises the reloaded aux state) applied
    # to BOTH engines must agree, and match recomputation.  top_cust is
    # advanced too so both views stay consistent with the advanced base.
    ra = rb = None
    for eng in (a, b):
        _delta(eng, "orders", "o_orderkey % 6 = 0", "false")
        for v in ("by_status", "top_cust"):
            eng.ivm_upsert(v)
            eng.merge_view(v)
        eng.apply_delta("orders")
    ra = rows(a.read_view("by_status"))
    rb = rows(b.read_view("by_status"))
    assert ra == rb
    assert rb == rows(b.full_refresh("by_status"))
    assert rows(a.read_view("top_cust")) == rows(b.read_view("top_cust"))


def test_load_missing_table_errors(spark, tmp_path):
    a = IVMEngine(spark)
    a.register_table("orders", f"{SF}/orders.parquet")
    a.create_immv("v", sql="SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus")
    path = str(tmp_path / "store2")
    a.save(path)
    from ivm_extension_spark.operators.rewrite import IVMError

    with pytest.raises(IVMError, match="references table"):
        IVMEngine.load(spark, path, tables={})


def test_save_load_union_view(spark, tmp_path):
    a = IVMEngine(spark)
    a.register_table("orders", f"{SF}/orders.parquet")
    a.register_table("customer", f"{SF}/customer.parquet")
    a.create_immv(
        "keys",
        sql="SELECT o_custkey AS k FROM orders "
        "UNION ALL SELECT c_custkey AS k FROM customer",
    )
    path = str(tmp_path / "store3")
    a.save(path)
    b = IVMEngine.load(
        spark, path,
        tables={"orders": a.table("orders"), "customer": a.table("customer")},
    )
    assert rows(b.read_view("keys")) == rows(a.read_view("keys"))
    _delta(b, "customer", "c_custkey % 20 = 0", "c_nationkey % 2 = 0")
    b.ivm_upsert("keys")
    got = rows(b.merge_view("keys"))
    b.apply_delta("customer")
    assert got == rows(b.full_refresh("keys"))
