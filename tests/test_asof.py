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
