"""Attribute py4j round trips to repo code sites.

Monkeypatches ``GatewayClient.send_command`` and, for every call,
records the innermost /root/repo stack frame (file:line:function).
Counts are exact and era-independent — the load-independent evidence
this host's degraded-CPU eras require (see memory note).  Diagnostic
only; not part of the driver contract.

Usage: python scripts/rt_attrib.py <key> [n_runs] [sf_dir] [topN]
"""

from __future__ import annotations

import gc
import os
import sys
import traceback
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from py4j.java_gateway import GatewayClient

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SITES: Counter = Counter()
FUNCS: Counter = Counter()
TOTAL = 0
ARMED = False

_orig_send = GatewayClient.send_command
REPO = "/root/repo"


def _patched_send(self, *a, **kw):
    global TOTAL
    if ARMED:
        TOTAL += 1
        frame = sys._getframe(1)
        inner = None
        while frame is not None:
            fn = frame.f_code.co_filename
            if fn.startswith(REPO):
                inner = frame
                break
            frame = frame.f_back
        if inner is not None:
            key = (
                f"{inner.f_code.co_filename[len(REPO) + 1:]}:"
                f"{inner.f_lineno}:{inner.f_code.co_name}"
            )
            SITES[key] += 1
            FUNCS[
                f"{inner.f_code.co_filename[len(REPO) + 1:]}::"
                f"{inner.f_code.co_name}"
            ] += 1
        else:
            SITES["<no-repo-frame>"] += 1
            FUNCS["<no-repo-frame>"] += 1
    return _orig_send(self, *a, **kw)


GatewayClient.send_command = _patched_send


def main() -> int:
    global ARMED
    key = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    topn = int(sys.argv[4]) if len(sys.argv) > 4 else 40
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rt-attrib")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[key]
    # warm once (engine/session caches), attribute the steady-state run
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    gc.collect()
    ARMED = True
    for _ in range(n):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    ARMED = False
    print(f"== {key}: {TOTAL} round trips over {n} run(s) ==")
    print("-- by function --")
    for name, c in FUNCS.most_common(topn):
        print(f"{c / n:10.1f}  {name}")
    print("-- by site --")
    for name, c in SITES.most_common(topn):
        print(f"{c / n:10.1f}  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
