"""Catalog surface: list/drop lifecycle and referential guards."""

import pytest

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import MULT_COL, IVMError


def test_list_and_drop_lifecycle(spark):
    eng = IVMEngine(spark)
    eng.register_table("t", spark.createDataFrame([(1, "x")], "a int, b string"))
    eng.create_immv("v", sql="SELECT b, sum(a) AS s FROM t GROUP BY b")
    assert eng.list_tables() == ["t"]
    assert eng.list_views() == ["v"]

    with pytest.raises(IVMError, match="referenced by views"):
        eng.drop_table("t")

    eng.drop_view("v")
    assert eng.list_views() == []
    with pytest.raises(IVMError, match="not registered"):
        eng.view("v")

    eng.drop_table("t")
    assert eng.list_tables() == []


def test_drop_view_clears_aux_state(spark):
    eng = IVMEngine(spark)
    eng.register_table("t", spark.createDataFrame([(1, "x")], "a int, b string"))
    eng.create_immv("v", sql="SELECT b, min(a) AS lo FROM t GROUP BY b")
    assert "v" in eng._aux and eng._aux["v"]
    eng.drop_view("v")
    assert "v" not in eng._aux


def test_execute_sql_front_door(spark):
    # reference entry-point parity: CREATE IMMV AS (ivm_parser.cpp:14-52,
    # unfinished there), PRAGMA ivm_upsert (ivm_extension.cpp:95-110),
    # and plain SQL over registered tables + materialized views
    from tests.conftest import rows

    eng = IVMEngine(spark)
    base = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 5)], "k string, x int"
    )
    eng.register_table("t", base)
    eng.execute("CREATE IMMV v AS SELECT k, sum(x) AS s FROM t GROUP BY k")
    assert rows(eng.read_view("v")) == [("a", 3), ("b", 5)]
    delta = spark.createDataFrame(
        [("b", 7, True)], f"k string, x int, {MULT_COL} boolean"
    )
    eng.register_delta("t", delta)
    dv = eng.execute("PRAGMA ivm_upsert('memory', 'main', 'v')")
    assert rows(dv) == [("b", 7, True)]
    eng.merge_view("v")
    got = eng.execute("SELECT k, s FROM v WHERE s > 4 ORDER BY k")
    assert rows(got) == [("b", 12)]
    # MATERIALIZED VIEW spelling (the reference's own regex helper shape)
    eng.execute("CREATE MATERIALIZED VIEW mv AS SELECT k FROM t")
    assert sorted(eng.list_views()) == ["mv", "v"]
