"""As-of join semantics (operators/asof.py)."""

from pyspark.sql import functions as F

from ivm_extension_spark.operators.asof import asof_join

from tests.conftest import rows


def test_asof_basic_and_ties(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, 100),
            ("A", 25, 101),
            ("A", 5, 102),   # before any quote -> NULL
            ("B", 30, 103),
        ],
        "sym string, ts int, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 10, 9.5),   # tie with trade at ts=10: at-or-before matches
            ("A", 20, 9.9),
            ("B", 40, 3.0),   # after B's trade -> NULL
        ],
        "sym string, ts int, px double",
    )
    out = rows(
        asof_join(trades, quotes, ("sym",), "ts", ("px",)).select(
            "sym", "ts", "trade_id", "px", "asof_ts"
        )
    )
    by_trade = {r[2]: (r[3], r[4]) for r in out}
    assert by_trade[100] == (9.5, 10)   # equal ts matches
    assert by_trade[101] == (9.9, 20)   # latest preceding quote
    assert by_trade[102] == (None, None)
    assert by_trade[103] == (None, None)
    assert len(out) == 4  # every left row survives exactly once


def test_asof_randomized_equals_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    left = spark.createDataFrame(
        [
            (str(rng.randint(0, 5)), int(rng.randint(0, 1000)), int(i))
            for i in range(300)
        ],
        "k string, ts int, lid int",
    )
    # unique (k, ts) on the right (as-of precondition)
    seen = set()
    rrows = []
    for i in range(120):
        kt = (str(rng.randint(0, 5)), int(rng.randint(0, 1000)))
        if kt in seen:
            continue
        seen.add(kt)
        rrows.append((*kt, float(i)))
    right = spark.createDataFrame(rrows, "k string, ts int, px double")

    # brute force: join all right rows at-or-before, keep the latest
    from pyspark.sql import Window

    r2 = right.select(
        F.col("k"), F.col("ts").alias("rts"), F.col("px").alias("rpx")
    )
    w = Window.partitionBy("k", "ts", "lid").orderBy(F.col("rts").desc())
    brute = {
        (r["lid"], r["rpx"], r["rts"])
        for r in left.join(r2, on=["k"], how="left")
        .filter((F.col("rts") <= F.col("ts")) | F.col("rts").isNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    } | {
        # left rows with NO right row at-or-before drop out of the filter
        # above only when they had SOME right rows for the key; recover
        # them via anti-join semantics below
        (r["lid"], None, None)
        for r in left.join(
            left.join(r2, on=["k"])
            .filter(F.col("rts") <= F.col("ts"))
            .select("lid")
            .distinct(),
            on=["lid"],
            how="left_anti",
        ).collect()
    }
    got = {
        (r["lid"], r["px"], r["asof_ts"])
        for r in asof_join(left, right, ("k",), "ts", ("px",)).collect()
    }
    assert got == brute


def test_asof_null_field_still_atomic(spark):
    # latest right row has a NULL value field: the carried (px, qty) must
    # still come from that SAME row, not mix px from an older row
    left = spark.createDataFrame([("A", 30, 1)], "k string, ts int, lid int")
    right = spark.createDataFrame(
        [("A", 10, 5.0, 7), ("A", 20, None, 9)],
        "k string, ts int, px double, qty int",
    )
    out = rows(asof_join(left, right, ("k",), "ts", ("px", "qty")))
    assert out == [("A", 30, 1, None, 9, 20)]
