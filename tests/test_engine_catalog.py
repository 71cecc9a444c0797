"""Catalog surface: list/drop lifecycle and referential guards."""

import pytest

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import IVMError


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
