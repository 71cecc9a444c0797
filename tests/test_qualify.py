"""QUALIFY: maintained top-N-per-group views (rank filters applied on
read over pre-QUALIFY state — ranks move under deltas, so like HAVING
the filter can never be folded into the maintained state).  The
reference has no rank filtering of any kind (SURVEY.md §2c)."""

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.operators.rewrite import MULT_COL

from tests.conftest import rows


def _mk(spark):
    data = [("g1", i, i * 10) for i in range(1, 6)] + [
        ("g2", i, 100 - i) for i in range(1, 4)
    ]
    return spark.createDataFrame(data, "g string, k int, x int")


SQL = (
    "SELECT g, k, sum(x) AS s FROM t GROUP BY g, k "
    "QUALIFY row_number() OVER (PARTITION BY g ORDER BY s DESC, k ASC) <= 2"
)


def _truth(eng):
    from pyspark.sql import Window

    base = eng.table("t").groupBy("g", "k").agg(F.sum("x").alias("s"))
    w = Window.partitionBy("g").orderBy(F.col("s").desc(), F.col("k").asc())
    return (
        base.withColumn("r", F.row_number().over(w))
        .filter("r <= 2")
        .drop("r")
    )


def test_qualify_initial_and_rank_movement(spark):
    eng = IVMEngine(spark)
    eng.register_table("t", _mk(spark))
    pub = eng.create_immv("v", sql=SQL)
    assert rows(pub) == rows(_truth(eng))
    # push a low-ranked group member to the top; delete a current top row
    delta = spark.createDataFrame(
        [("g1", 1, 1000, True), ("g1", 5, 50, False)],
        f"g string, k int, x int, {MULT_COL} boolean",
    )
    eng.register_delta("t", delta)
    eng.ivm_upsert("v")
    merged = eng.merge_view("v")
    eng.apply_delta("t")
    assert rows(merged) == rows(_truth(eng))
    # rows OUTSIDE the current top-2 must still be maintained in state:
    # deleting the top row promotes the runner-up that was never visible
    delta2 = spark.createDataFrame(
        [("g1", 1, 1000, False), ("g1", 1, 10, False)],
        f"g string, k int, x int, {MULT_COL} boolean",
    )
    eng.register_delta("t", delta2)
    eng.ivm_upsert("v")
    merged2 = eng.merge_view("v")
    eng.apply_delta("t")
    assert rows(merged2) == rows(_truth(eng))


def test_qualify_rejections_and_delta_shape(spark):
    eng = IVMEngine(spark)
    eng.register_table("t", _mk(spark))
    with pytest.raises(NotImplementedError, match="QUALIFY"):
        eng.create_immv(
            "r",
            sql="SELECT g, sum(x) AS s FROM t GROUP BY ROLLUP (g) "
            "QUALIFY row_number() OVER (ORDER BY s) <= 1",
        )
    eng.create_immv("v", sql=SQL)
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [("g1", 1, 5, True)], f"g string, k int, x int, {MULT_COL} boolean"
        ),
    )
    # ΔV is never qualified (it is a change stream, not a ranked read)
    dv = eng.ivm_upsert("v")
    assert MULT_COL in dv.columns


def test_qualify_survives_persistence(spark, tmp_path):
    eng = IVMEngine(spark)
    eng.register_table("t", _mk(spark))
    eng.create_immv("v", sql=SQL)
    path = str(tmp_path / "state")
    eng.save(path)
    eng2 = IVMEngine.load(spark, path, tables={"t": _mk(spark)})
    assert eng2.view("v").qualify is not None
    assert rows(eng2.read_view("v")) == rows(_truth(eng2))


def test_cdc_over_rank_filtered_views_rejected(spark):
    """merge_view_cdc must refuse rank-filtered views: a delta touching
    one key can evict ANOTHER key from the visible top-N, and the
    affected-key CDC would silently miss that retraction."""
    from ivm_extension_spark.operators.rewrite import IVMError

    eng = IVMEngine(spark)
    eng.register_table("t", _mk(spark))
    eng.create_immv("v", sql=SQL)
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [("g1", 1, 5, True)], f"g string, k int, x int, {MULT_COL} boolean"
        ),
    )
    with pytest.raises(IVMError, match="non-local"):
        eng.merge_view_cdc("v")
    # ORDER BY + LIMIT views hit the same wall
    eng.create_immv(
        "w",
        sql="SELECT g, sum(x) AS s FROM t GROUP BY g ORDER BY s DESC, g ASC LIMIT 1",
    )
    with pytest.raises(IVMError, match="non-local"):
        eng.merge_view_cdc("w")


def test_cdc_over_grouping_sets_rejected(spark):
    from ivm_extension_spark.operators.rewrite import IVMError

    eng = IVMEngine(spark)
    eng.register_table("t", _mk(spark))
    eng.create_immv(
        "r", sql="SELECT g, sum(x) AS s FROM t GROUP BY ROLLUP (g)"
    )
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [("g1", 1, 5, True)], f"g string, k int, x int, {MULT_COL} boolean"
        ),
    )
    with pytest.raises(IVMError, match="finest-grouping"):
        eng.merge_view_cdc("r")
