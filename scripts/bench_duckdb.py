"""DuckDB yardstick for bench.py: run every oracle_sql() query on the
same parquet tables (default sf0.1) and print ONE JSON line in the same
shape as bench.py.

BASELINE.md's performance bar is "BENCH within 2x of BASELINE (DuckDB on
the same queries) at the same scale factor" — this script produces the
BASELINE side.  Queries without an oracle (sketches / ANN variants /
stubs) have no DuckDB equivalent and are skipped; compare per-query via
the shared keys.

Usage: python scripts/bench_duckdb.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32; duckdb threads)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = set(sys.argv[1:])

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    oracles = entrymod.oracle_sql()
    # warmup: touch every table so OS page cache is as warm as bench.py's
    for t in entrymod.TABLES:
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    timings: dict[str, float] = {}
    total = 0.0
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        # min-of-2 with up to 2 retries on >1.8x disagreement — identical
        # policy to bench.py so shared-host load spikes hit both sides
        samples: list[float] = []
        while len(samples) < 4:
            t0 = time.perf_counter()
            try:
                # full materialization without client transfer, mirroring
                # bench.py's noop sink
                con.execute(f"CREATE OR REPLACE TEMP TABLE __bench_out AS ({sql})")
                samples.append(time.perf_counter() - t0)
            except Exception as e:
                print(f"# ERROR {name}: {e}", file=sys.stderr)
                break
            if len(samples) >= 2 and max(samples) / max(min(samples), 1e-9) <= 1.8:
                break
        dt = min(samples) if samples else float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "duckdb_total_runtime_oracle_queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
