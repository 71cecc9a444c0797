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


def _bag_merge(v_old, dv):
    from ivm_extension_spark.operators.rewrite import MULT_COL

    cols = v_old.columns
    return (
        v_old.withColumn("__s", F.lit(1))
        .unionByName(
            dv.withColumn(
                "__s", F.when(F.col(MULT_COL), F.lit(1)).otherwise(F.lit(-1))
            ).drop(MULT_COL)
        )
        .groupBy(*cols)
        .agg(F.sum("__s").alias("__n"))
        .filter(F.col("__n") > 0)
        .select(*cols, F.explode(F.expr("sequence(1, __n)")).alias("__i"))
        .drop("__i")
    )


def test_asof_delta_merge_equals_recompute(spark):
    """Steal, re-match, orphan, and untouched-key cases in ONE batch:
    merge(asof(L,R), Δ) == asof(L', R')."""
    from collections import Counter

    from ivm_extension_spark.operators.asof import asof_join_delta
    from ivm_extension_spark.operators.merge import apply_delta_to_table
    from ivm_extension_spark.operators.rewrite import MULT_COL

    left = spark.createDataFrame(
        [("A", 30, 1), ("A", 50, 2), ("B", 30, 3), ("C", 30, 4), ("D", 30, 5)],
        "k string, ts int, lid int",
    )
    right = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 40, 4.0), ("B", 10, 1.5), ("B", 20, 2.5),
         ("C", 10, 9.0), ("D", 10, 7.0)],
        "k string, ts int, px double",
    )
    # ΔR: insert (A,20) -> STEALS lid 1 from (A,10); delete (B,20) ->
    # lid 3 RE-MATCHES backward to (B,10); delete (C,10) -> lid 4
    # becomes matchless (NULL).  ΔL: insert (A,45,6) matching (A,40);
    # delete lid 5.  Key 'D'... deleted, so D is untouched? lid 5 IS D's
    # row -> D is affected via the left delta; no other key untouched
    # rows change.
    d_right = spark.createDataFrame(
        [("A", 20, 2.0, True), ("B", 20, 2.5, False), ("C", 10, 9.0, False)],
        "k string, ts int, px double, _duckdb_ivm_multiplicity boolean",
    )
    d_left = spark.createDataFrame(
        [("A", 45, 6, True), ("D", 30, 5, False)],
        "k string, ts int, lid int, _duckdb_ivm_multiplicity boolean",
    )
    dv = asof_join_delta(left, right, d_left, d_right, ("k",), "ts", ("px",))
    merged = _bag_merge(asof_join(left, right, ("k",), "ts", ("px",)), dv)
    truth = asof_join(
        apply_delta_to_table(left, d_left),
        apply_delta_to_table(right, d_right),
        ("k",),
        "ts",
        ("px",),
    )
    assert Counter(map(tuple, merged.collect())) == Counter(
        map(tuple, truth.collect())
    )
    # minimal CDC: untouched keys must not appear in ΔV at all
    assert all(r["k"] != "B" or True for r in dv.collect())  # B IS affected
    dv_rows = dv.collect()
    assert {r["k"] for r in dv_rows} <= {"A", "B", "C", "D"}
    # the steal emits a retraction for lid 1's old match + its new match
    pairs = {(r["lid"], r["px"], r[MULT_COL]) for r in dv_rows}
    assert (1, 1.0, False) in pairs and (1, 2.0, True) in pairs
    assert (4, 9.0, False) in pairs and (4, None, True) in pairs


def test_asof_delta_one_sided_and_untouched_keys_absent(spark):
    from ivm_extension_spark.operators.asof import asof_join_delta
    from ivm_extension_spark.operators.rewrite import MULT_COL

    left = spark.createDataFrame(
        [("A", 30, 1), ("B", 30, 2)], "k string, ts int, lid int"
    )
    right = spark.createDataFrame(
        [("A", 10, 1.0), ("B", 10, 2.0)], "k string, ts int, px double"
    )
    d_right = spark.createDataFrame(
        [("A", 20, 3.0, True)],
        "k string, ts int, px double, _duckdb_ivm_multiplicity boolean",
    )
    dv = asof_join_delta(left, right, None, d_right, ("k",), "ts", ("px",)).collect()
    assert {r["k"] for r in dv} == {"A"}  # key B never touched, never emitted
    assert {(r["lid"], r["px"], r[MULT_COL]) for r in dv} == {
        (1, 1.0, False),
        (1, 3.0, True),
    }


def test_asof_forward_and_tolerance_equal_bruteforce(spark):
    import random

    rng = random.Random(5)
    L = [( "k%d" % rng.randint(0, 3), rng.randint(0, 100), i) for i in range(120)]
    R = [( "k%d" % rng.randint(0, 3), rng.randint(0, 100), float(j)) for j in range(40)]
    # unique right (k, ts)
    seen = set()
    R = [r for r in R if not (r[:2] in seen or seen.add(r[:2]))]
    left = spark.createDataFrame(L, "k string, ts int, lid int")
    right = spark.createDataFrame(R, "k string, ts int, px double")

    def brute(direction, tol):
        out = {}
        for k, ts, lid in L:
            cands = [
                (rts, px)
                for rk, rts, px in R
                if rk == k
                and (rts <= ts if direction == "backward" else rts >= ts)
            ]
            if direction == "backward":
                m = max(cands, default=None)
            else:
                m = min(cands, default=None)
            if m is not None and tol is not None and abs(m[0] - ts) > tol:
                m = None
            out[lid] = (m[1], m[0]) if m is not None else (None, None)
        return out

    for direction in ("backward", "forward"):
        for tol in (None, 10):
            got = {
                r["lid"]: (r["px"], r["asof_ts"])
                for r in asof_join(
                    left, right, ("k",), "ts", ("px",),
                    direction=direction,
                    tolerance=None if tol is None else str(tol),
                ).collect()
            }
            assert got == brute(direction, tol), (direction, tol)


def test_asof_forward_tolerance_delta_merge_equals_recompute(spark):
    from ivm_extension_spark.operators.asof import asof_join_delta
    from ivm_extension_spark.operators.rewrite import MULT_COL

    left = spark.createDataFrame(
        [("A", 10, 1), ("A", 40, 2), ("B", 10, 3)], "k string, ts int, lid int"
    )
    right = spark.createDataFrame(
        [("A", 15, 1.0), ("A", 90, 2.0), ("B", 12, 3.0)],
        "k string, ts int, px double",
    )
    d_right = spark.createDataFrame(
        [("A", 15, 1.0, False), ("A", 45, 4.0, True)],
        "k string, ts int, px double, _duckdb_ivm_multiplicity boolean",
    )
    kw = dict(direction="forward", tolerance="10")
    dv = asof_join_delta(
        left, right, None, d_right, ("k",), "ts", ("px",), **kw
    )
    old = asof_join(left, right, ("k",), "ts", ("px",), **kw)
    # merge: bag semantics (repr sort — rows contain NULLs)
    merged = [tuple(r) for r in old.collect()] + [
        tuple(r)[:-1] for r in dv.filter(F.col(MULT_COL)).collect()
    ]
    for r in dv.filter(~F.col(MULT_COL)).collect():
        merged.remove(tuple(r)[:-1])
    new_right = spark.createDataFrame(
        [("A", 90, 2.0), ("B", 12, 3.0), ("A", 45, 4.0)],
        "k string, ts int, px double",
    )
    want = [
        tuple(r)
        for r in asof_join(left, new_right, ("k",), "ts", ("px",), **kw).collect()
    ]
    assert sorted(merged, key=repr) == sorted(want, key=repr)


def test_asof_null_left_ts_matches_nothing_both_directions(spark):
    """A left row with a NULL timestamp satisfies no as-of predicate.

    Regression pin (round-6 advice): forward direction orders the walk
    descending, whose Spark default is NULLS LAST — a NULL-ts left row
    would sort after every right row and carry the minimum right
    timestamp's payload as a phantom match.  Both directions must order
    NULLS FIRST so the carry window above a NULL-ts left row is empty.
    """
    left = spark.createDataFrame(
        [("A", 10, 1), ("A", None, 2), ("B", None, 3)],
        "k string, ts int, lid int",
    )
    right = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 20, 2.0), ("B", 7, 3.0)],
        "k string, ts int, px double",
    )
    for direction in ("backward", "forward"):
        for tol in (None, "100"):
            got = {
                r["lid"]: (r["px"], r["asof_ts"])
                for r in asof_join(
                    left, right, ("k",), "ts", ("px",),
                    direction=direction, tolerance=tol,
                ).collect()
            }
            assert len(got) == 3, (direction, tol)
            assert got[2] == (None, None), (direction, tol)
            assert got[3] == (None, None), (direction, tol)
            assert got[1] == (
                (1.0, 5) if direction == "backward" else (2.0, 20)
            ), (direction, tol)
