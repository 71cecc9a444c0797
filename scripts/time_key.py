"""Steady-state timing of driver query keys: one warm session, N runs
per key (noop sink), prints every wall time and the min.  More samples
than bench.py's min-of-2 — for before/after comparisons of a targeted
optimization.  Diagnostic only; not part of the driver contract.

Usage: python scripts/time_key.py <key>[,key...] [n_runs] [sf_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main() -> int:
    keys = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-key")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # match bench.py: call-site capture off (driver-side overhead)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for key in keys:
        fn = qs[key]
        walls = []
        for i in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()  # release py4j refs -> JVM frees checkpoint blocks
        print(
            f"{key}: "
            + " ".join(f"{w:.2f}" for w in walls)
            + f"  min={min(walls[1:] or walls):.2f} (excl. first)"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
