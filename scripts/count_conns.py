"""Era-independent thread/connection churn diagnostic.

Counts, per bench-key run:
  - py4j ClientServerConnection creations (each = one new socket + one
    new pinned JVM thread, in PYSPARK_PIN_THREAD mode)
  - Python threads started
  - JVM live thread count before/after the run
  - py4j GatewayClient round trips (send_command calls)

These counts are exact and independent of the host's CPU era, unlike
wall clock (see memory: degraded-CPU eras).  Diagnostic only; not part
of the driver contract.

Usage: python scripts/count_conns.py <key>[,key...] [n_runs] [sf_dir]
"""

from __future__ import annotations

import gc
import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import py4j.clientserver as _cs
from py4j.java_gateway import GatewayClient

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

CONNS = 0
THREADS = 0
RTS = 0

_orig_connect = _cs.ClientServerConnection.connect_to_java_server


def _patched_connect(self):
    global CONNS
    CONNS += 1
    return _orig_connect(self)


_cs.ClientServerConnection.connect_to_java_server = _patched_connect

_orig_thread_start = threading.Thread.start


def _patched_start(self):
    global THREADS
    THREADS += 1
    return _orig_thread_start(self)


threading.Thread.start = _patched_start

_orig_send = GatewayClient.send_command


def _patched_send(self, *a, **kw):
    global RTS
    RTS += 1
    return _orig_send(self, *a, **kw)


GatewayClient.send_command = _patched_send


def main() -> int:
    keys = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("count-conns")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def jvm_threads() -> int:
        return spark._jvm.java.lang.Thread.activeCount()

    qs = entrymod.queries()
    global CONNS, THREADS, RTS
    for key in keys:
        fn = qs[key]
        for i in range(n):
            gc.collect()
            jt0 = jvm_threads()
            c0, t0, r0 = CONNS, THREADS, RTS
            w0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - w0
            jt1 = jvm_threads()
            print(
                f"{key}[{i}]: conns={CONNS - c0} pythreads={THREADS - t0} "
                f"rts={RTS - r0} jvm_threads {jt0}->{jt1} wall={wall:.2f}"
            )
            spark.catalog.clearCache()
            gc.collect()
    # post-GC settle: how many JVM threads remain after everything
    gc.collect()
    time.sleep(1.0)
    print(f"final jvm_threads={jvm_threads()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
