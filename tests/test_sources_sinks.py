"""Source/sink round-trips: csv, json, partitioned parquet, bucketed
tables — every reader funnels into the same DataFrame substrate, so the
engine runs identically over any of them."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark import IVMEngine
from ivm_extension_spark.sources import (
    read_any,
    write_bucketed,
    write_partitioned,
)

from tests.conftest import rows


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ivm_src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


DATA = [(1, "x", 10.5), (2, "y", 20.0), (3, "x", 7.25)]
SCHEMA = "id int, k string, v double"


def test_csv_json_roundtrip(spark, tmpdir):
    df = spark.createDataFrame(DATA, SCHEMA)
    df.coalesce(1).write.option("header", "true").csv(f"{tmpdir}/t.csv")
    df.coalesce(1).write.json(f"{tmpdir}/t.json")

    got_csv = rows(read_any(spark, f"{tmpdir}/t.csv", schema=SCHEMA))
    got_json = rows(read_any(spark, f"{tmpdir}/t.json", schema=SCHEMA))
    want = rows(df)
    assert got_csv == want and got_json == want


def test_csv_source_feeds_ivm_engine(spark, tmpdir):
    spark.createDataFrame(DATA, SCHEMA).coalesce(1).write.option(
        "header", "true"
    ).csv(f"{tmpdir}/t.csv")
    eng = IVMEngine(spark)
    eng.register_table("t", read_any(spark, f"{tmpdir}/t.csv", schema=SCHEMA))
    eng.register_delta(
        "t",
        spark.createDataFrame(
            [(4, "y", 1.0, True)], SCHEMA + ", _duckdb_ivm_multiplicity boolean"
        ),
    )
    eng.create_immv("vw", sql="SELECT k, sum(id) AS s FROM t GROUP BY k")
    eng.ivm_upsert("vw")
    assert rows(eng.merge_view("vw")) == [("x", 4), ("y", 6)]


def test_write_partitioned_prunes(spark, tmpdir):
    df = spark.createDataFrame(DATA, SCHEMA)
    write_partitioned(df, f"{tmpdir}/part", partition_by=("k",))
    back = spark.read.parquet(f"{tmpdir}/part")
    assert rows(back.select("id", "k", "v")) == rows(df)
    # partition pruning: the filtered scan must only list the k=x directory
    plan = back.filter(F.col("k") == "x")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan


def test_write_bucketed_shuffle_free_join(spark, tmpdir):
    # warehouse dir is a static conf — tables land in the session default
    # (./spark-warehouse) and are dropped below
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    df = spark.createDataFrame(DATA, SCHEMA)
    write_bucketed(df, "bt_a", bucket_by=("id",), n_buckets=4, sort_by=("id",))
    write_bucketed(df, "bt_b", bucket_by=("id",), n_buckets=4, sort_by=("id",))
    a = spark.table("bt_a")
    b = spark.table("bt_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, on="id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # same bucketing both sides: no Exchange in the join plan
        assert "Exchange" not in plan
        assert joined.count() == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_orc_roundtrip_and_inference(spark, tmpdir):
    df = spark.createDataFrame(DATA, SCHEMA)
    df.coalesce(1).write.orc(f"{tmpdir}/t.orc")
    got = rows(read_any(spark, f"{tmpdir}/t.orc", schema=SCHEMA))
    assert got == rows(df)
    # extension-based inference (no fmt= needed)
    assert rows(read_any(spark, f"{tmpdir}/t.orc")) == rows(df)
