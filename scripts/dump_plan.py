"""Dump ``.explain("formatted")`` for driver query keys to a file.

Usage: python scripts/dump_plan.py <outdir> <suffix> <key> [key ...]

Writes ``<outdir>/<key>_<suffix>.txt`` for each key.  The plan captured
is the DECLARED query's final DataFrame plan (the same object bench.py
times), built at sf0.1 so statistics and AQE thresholds match the bench.
Diagnostic only — not part of the driver contract.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main() -> int:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    keys = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-plan")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for key in keys:
        if key not in qs:
            print(f"SKIP {key}: not a registered query", file=sys.stderr)
            continue
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{key}_{suffix}.txt").write_text(plan)
        print(f"wrote {outdir / f'{key}_{suffix}.txt'}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
