"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND the matching
``oracle_sql()`` on DuckDB, then compares:
  - row count
  - column names (sorted)
  - order-insensitive TYPED value equality (rows sorted after sorting
    columns by name).

The typed comparison mirrors the driver's value hash: the DuckDB side is
fetched through Arrow (so ``sum(BIGINT)`` surfaces as HUGEINT →
``decimal128(38,0)`` → ``decimal.Decimal``, exactly as the driver sees it),
and ``canon`` keeps type classes distinct (int vs Decimal vs float) and
floats bit-exact (``float.hex``) instead of round-to-9 stringification.
Round 1 lesson: the old string-canon gate passed 11 queries the driver
hashed red purely on this representational difference (VERDICT.md r1).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def canon(v) -> str:
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        # decimal128 from DuckDB HUGEINT — deliberately NOT merged with int:
        # the driver hashes these differently, so must we.
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "d:NaN"
        return f"d:{v.hex()}"
    if isinstance(v, datetime.datetime):
        return "ts:" + v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "b:" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, str):
        return f"s:{v}"
    return f"{type(v).__name__}:{v}"


def df_to_canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(srows)} rows)")
            continue
        try:
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            ocols = tbl.column_names
            opy = tbl.to_pylist()
            orows = [tuple(d[c] for c in ocols) for d in opy]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        sc, sr = df_to_canon(scols, srows)
        oc, orows_c = df_to_canon(ocols, orows)
        ok = True
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            ok = False
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            ok = False
        if ok and sr != orows_c:
            diff = [(a, b) for a, b in zip(sr, orows_c) if a != b][:5]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            ok = False
        if ok:
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            n_fail += 1
    print(f"\n{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
