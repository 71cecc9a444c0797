"""Per-job profile of one driver query key: run it like bench.py does
(noop sink, min-of-2 policy skipped — single steady-state run after a
warmup) with the Spark UI enabled, then dump every job's duration and
description from the UI REST API.  Diagnostic only — not part of the
driver contract.

Usage: python scripts/profile_key.py <key> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod


def main() -> int:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4455")
        # match bench.py: call-site capture off (driver-side overhead)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entrymod.queries()[key]
    # warmup run (codegen, parquet footers)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    sc = spark.sparkContext
    before = sc._jsc.sc().dagScheduler().nextJobId()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    app_id = sc.applicationId
    url = f"http://localhost:4455/api/v1/applications/{app_id}/jobs"
    jobs = json.load(urllib.request.urlopen(url))
    rows = []
    for j in jobs:
        if j["jobId"] < before:
            continue
        dur = None
        if j.get("completionTime") and j.get("submissionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            st = datetime.strptime(j["submissionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            en = datetime.strptime(j["completionTime"].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            dur = (en - st).total_seconds()
        rows.append((j["jobId"], dur, j.get("numTasks"), (j.get("description") or j.get("name") or "")[:110]))
    rows.sort()
    print(f"# {key}: steady-state wall {wall:.2f}s, {len(rows)} jobs")
    for jid, dur, ntasks, desc in rows:
        print(f"job {jid:4d}  {dur if dur is not None else -1:7.3f}s  tasks={ntasks:4d}  {desc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
