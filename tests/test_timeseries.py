"""Gap-fill / bucket-resample (operators/timeseries.py).

Semantics under test: TimescaleDB-style time_bucket_gapfill — every
missing bucket between a key's first and last observation appears
exactly once, locf carries the anchor value, linear interpolates toward
the successor, null leaves gaps NULL; keys never bleed into each other.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ivm_extension_spark.operators import timeseries as ts
from tests.conftest import rows


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime.utcfromtimestamp(sec), float(v)) for k, sec, v in rows],
        "k int, ts timestamp, v double",
    )


def _bucketed(spark, rows, step=60):
    df = _events(spark, rows)
    return ts.bucket_resample(
        df, ["k"], "ts", step,
        {"s": F.sum(F.expr("CAST(round(v * 100) AS BIGINT)")), "c": F.count(F.lit(1))},
    )


def test_bucket_resample_exact(spark):
    b = _bucketed(spark, [(1, 0, 1.0), (1, 59, 2.0), (1, 60, 4.0)])
    got = {(r["k"], r["bucket"]): (r["s"], r["c"]) for r in b.collect()}
    assert got == {(1, 0): (300, 2), (1, 60): (400, 1)}


def test_gap_fill_locf_linear_null(spark):
    # key 1: buckets 0, 180 (gap at 60, 120); key 2: single bucket (no gaps)
    b = _bucketed(spark, [(1, 0, 1.0), (1, 180, 4.0), (2, 60, 9.0)])
    b = b.withColumn("lin", F.col("s"))
    out = ts.gap_fill(
        b, ["k"], 60, {"s": "locf", "c": "null", "lin": "linear"}
    )
    rows = {(r["k"], r["bucket"]): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 60), (1, 120), (1, 180), (2, 60)}
    # anchors keep their values, is_gap False
    assert rows[(1, 0)]["s"] == 100 and rows[(1, 0)]["c"] == 1
    assert not rows[(1, 0)]["is_gap"] and not rows[(2, 60)]["is_gap"]
    # locf carries, null blanks, linear interpolates 100 -> 400 over 3 steps
    for bk, lin in ((60, 200.0), (120, 300.0)):
        r = rows[(1, bk)]
        assert r["is_gap"] and r["s"] == 100 and r["c"] is None
        assert r["lin"] == pytest.approx(lin, abs=0)
    # anchor linear value is the exact observation
    assert rows[(1, 180)]["lin"] == 400.0
    # single-bucket key emits itself only — no trailing extrapolation
    assert rows[(2, 60)]["s"] == 900


def test_gap_fill_no_gaps_identity(spark):
    b = _bucketed(spark, [(1, 0, 1.0), (1, 60, 2.0), (1, 120, 3.0)])
    out = ts.gap_fill(b, ["k"], 60, {"s": "locf"})
    rows = sorted((r["bucket"], r["s"], r["is_gap"]) for r in out.collect())
    assert rows == [(0, 100, False), (60, 200, False), (120, 300, False)]


def test_gap_fill_rejects_unknown_method(spark):
    b = _bucketed(spark, [(1, 0, 1.0)])
    with pytest.raises(ValueError, match="unknown fill methods"):
        ts.gap_fill(b, ["k"], 60, {"s": "cubic"})


def test_gap_fill_matches_duckdb_twin(spark):
    """Value-exact cross-check of the driver key's shape on a seeded
    random series (including the double linear column — same IEEE
    expression shape both engines)."""
    import random

    import duckdb

    rng = random.Random(42)
    rows = [
        (k, rng.randrange(0, 3600), round(rng.uniform(0, 100), 2))
        for k in (1, 2, 3) for _ in range(12)
    ]
    b = _bucketed(spark, rows, step=300).withColumn("lin", F.col("s"))
    out = ts.gap_fill(b, ["k"], 300, {"s": "locf", "c": "null", "lin": "linear"})
    got = sorted(
        (r["k"], r["bucket"], r["s"], r["c"], r["lin"], r["is_gap"])
        for r in out.collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(k INT, sec BIGINT, v DOUBLE)"
    )
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
    want = con.execute("""
        WITH b AS (
          SELECT k, (sec // 300) * 300 AS bucket,
                 CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS s,
                 count(*) AS c
          FROM ev GROUP BY 1, 2
        ), w AS (
          SELECT b.*, lead(bucket) OVER pk AS nb, lead(s) OVER pk AS nv
          FROM b WINDOW pk AS (PARTITION BY k ORDER BY bucket)
        ), g AS (
          SELECT k, bucket AS b0, s, c, nb, nv,
                 unnest(range(bucket, coalesce(nb, bucket + 300), 300)) AS gb
          FROM w
        )
        SELECT k, CAST(gb AS BIGINT) AS bucket, CAST(s AS BIGINT) AS s,
               CASE WHEN gb = b0 THEN c END AS c,
               CASE WHEN gb = b0 THEN CAST(s AS DOUBLE)
                    ELSE CAST(s AS DOUBLE)
                         + (CAST(nv AS DOUBLE) - CAST(s AS DOUBLE))
                           * (CAST(gb - b0 AS DOUBLE) / CAST(nb - b0 AS DOUBLE))
               END AS lin,
               gb <> b0 AS is_gap
        FROM g ORDER BY k, bucket
    """).fetchall()
    assert got == [tuple(r) for r in want]


def _gap_engine(spark):
    from ivm_extension_spark.engine import IVMEngine

    eng = IVMEngine(spark)
    base = _events(
        spark,
        [(1, 0, 1.0), (1, 30, 2.0), (1, 240, 4.0), (2, 60, 9.0)],
    ).toDF("user_id", "ts", "value")
    eng.register_table("ev", base)
    eng.create_immv(
        "v",
        sql="SELECT user_id, (unix_timestamp(ts) div 60) * 60 AS bucket, "
        "sum(cast(round(value * 100) AS bigint)) AS cents, count(*) AS cnt "
        "FROM ev GROUP BY user_id, (unix_timestamp(ts) div 60) * 60",
    )
    return eng


def test_engine_read_gapfill_maintains_and_fills(spark):
    """The IVM × gap-fill invariant: merged state gap-filled on read ==
    recompute-from-applied-base gap-filled — including a delta that
    OPENS a new gap (insert far ahead) and one that lands INSIDE an
    existing gap (splitting it)."""
    import datetime as dt

    from ivm_extension_spark.engine import MULT_COL
    from pyspark.sql import Row

    eng = _gap_engine(spark)
    delta = spark.createDataFrame(
        [
            Row(user_id=2, ts=dt.datetime.utcfromtimestamp(360), value=1.0, m=True),
            Row(user_id=1, ts=dt.datetime.utcfromtimestamp(120), value=5.0, m=True),
            Row(user_id=1, ts=dt.datetime.utcfromtimestamp(30), value=2.0, m=False),
        ],
    ).withColumnRenamed("m", MULT_COL)
    eng.register_delta("ev", delta)
    eng.ivm_upsert("v")
    eng.merge_view("v")
    got = rows(
        eng.read_gapfill("v", 60, {"cents": "locf", "cnt": "linear"}, bucket_col="bucket")
    )
    # recompute twin: applied base -> same rollup -> same fill
    from ivm_extension_spark.engine import IVMEngine

    eng2 = IVMEngine(spark)
    applied = _events(
        spark,
        [(1, 0, 1.0), (1, 240, 4.0), (2, 60, 9.0), (2, 360, 1.0), (1, 120, 5.0)],
    ).toDF("user_id", "ts", "value")
    eng2.register_table("ev", applied)
    eng2.create_immv(
        "v2",
        sql="SELECT user_id, (unix_timestamp(ts) div 60) * 60 AS bucket, "
        "sum(cast(round(value * 100) AS bigint)) AS cents, count(*) AS cnt "
        "FROM ev GROUP BY user_id, (unix_timestamp(ts) div 60) * 60",
    )
    want = rows(
        eng2.read_gapfill("v2", 60, {"cents": "locf", "cnt": "linear"}, bucket_col="bucket")
    )
    assert got == want
    # the split gap: user 1 now anchors 0, 120, 240 -> gaps at 60 and 180
    by = {(r[0], r[1]): r for r in got}
    assert by[(1, 60)][4] is True and by[(1, 180)][4] is True
    assert by[(1, 60)][2] == 100 and by[(1, 180)][2] == 500  # locf from new anchor


def test_engine_read_gapfill_validation(spark):
    import pytest as _pytest

    from ivm_extension_spark.engine import IVMError

    eng = _gap_engine(spark)
    with _pytest.raises(IVMError, match="not a group key"):
        eng.read_gapfill("v", 60, {"cents": "locf"}, bucket_col="nope")
    with _pytest.raises(IVMError, match="not aggregate outputs"):
        eng.read_gapfill("v", 60, {"user_id": "locf"}, bucket_col="bucket")
    eng.create_immv("p", sql="SELECT user_id, value FROM ev")
    with _pytest.raises(IVMError, match="not an aggregate view"):
        eng.read_gapfill("p", 60, {"value": "locf"}, bucket_col="user_id")


def test_time_bucket_floors_pre_epoch(spark):
    # truncation would put 1969-12-31 23:58:20 (epoch -100) in bucket 0,
    # which starts AFTER the observation; the floor lands it in -900
    df = _events(spark, [(1, -100, 1.0)])
    got = df.select(ts.time_bucket("ts", 900).alias("b")).collect()
    assert got[0]["b"] == -900


def test_gap_fill_step_coarser_than_spacing_no_crash(spark):
    # buckets 0, 60, 180 with step=120: grid points are _b + k*120 below
    # the successor — never a sequence() stop below its start
    b = _bucketed(spark, [(1, 0, 1.0), (1, 60, 2.0), (1, 300, 3.0)])
    out = ts.gap_fill(b, ["k"], 120, {"s": "locf"})
    rows = sorted((r["bucket"], r["s"], r["is_gap"]) for r in out.collect())
    # each run's grid anchors at its own observation: 0 -> successor 60
    # closer than one step (no gap); 60 -> one grid point (180) before
    # the 300 anchor; 300 -> itself
    assert rows == [
        (0, 100, False),
        (60, 200, False),
        (180, 200, True),
        (300, 300, False),
    ]


def test_gap_fill_duplicate_bucket_rows_no_crash(spark):
    # duplicate (key, bucket) rows (possible on raw user input that
    # skipped bucket_resample): successor == own bucket must not build
    # an empty-bounds sequence
    import datetime as dt

    df = spark.createDataFrame(
        [(1, 0, 10), (1, 0, 20), (1, 120, 30)], "k int, bucket long, s long"
    )
    out = ts.gap_fill(df, ["k"], 60, {"s": "locf"})
    got = sorted((r["bucket"], r["s"], r["is_gap"]) for r in out.collect())
    # both duplicate anchors emit themselves; the gap at 60 fills from
    # the later duplicate (window order ties are engine-stable)
    assert (0, 10, False) in got and (0, 20, False) in got
    assert (120, 30, False) in got
    assert any(b == 60 and g for b, _, g in got)


def test_engine_read_gapfill_rejects_grouping_sets(spark):
    import pytest as _pytest

    from ivm_extension_spark.engine import IVMEngine, IVMError

    eng = IVMEngine(spark)
    eng.register_table(
        "t", spark.createDataFrame([(1, 0, 1.0)], "k int, b long, v double")
    )
    eng.create_immv(
        "r",
        sql="SELECT k, b, sum(cast(round(v * 100) AS bigint)) AS cents "
        "FROM t GROUP BY ROLLUP (k, b)",
    )
    with _pytest.raises(IVMError, match="ROLLUP/CUBE/GROUPING SETS"):
        eng.read_gapfill("r", 60, {"cents": "locf"}, bucket_col="b")
