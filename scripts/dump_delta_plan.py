"""Dump the PRE-PIN ΔV ``.explain("formatted")`` of a lifecycle key.

The per-key ``*_after.txt`` dumps of a merged lifecycle show only the
pinned result (`Scan ExistingRDD`), which proves nothing about the
delta rule's join tree.  This tool intercepts ``IVMEngine.ivm_upsert``
while the DECLARED query runs and dumps the ΔV plan the rule actually
built (the LAST upsert of the run — steady state for multi-batch
drives).  Same normalization caveats as dump_plan.py: exprIds and RDD
ids differ run to run; compare shape-normalized.  Diagnostic only.

Usage: python scripts/dump_delta_plan.py <outdir> <suffix> <key> [key ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from ivm_extension_spark import engine as engmod


def main() -> int:
    outdir = Path(sys.argv[1])
    suffix = sys.argv[2]
    keys = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dump-delta-plan")
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

    captured: dict = {}
    orig = engmod.IVMEngine.ivm_upsert

    def spy(self, name):
        dv = orig(self, name)
        captured["dv"] = dv
        return dv

    engmod.IVMEngine.ivm_upsert = spy

    # keys that drive an operator-level rule directly (no engine
    # upsert): spy every public *_delta function of the rule modules —
    # the OUTERMOST rule returns last, so the final capture is its ΔV
    from ivm_extension_spark.operators import (
        asof as _asof,
        ineqjoin as _ineq,
        rangejoin as _range,
        thetajoin as _theta,
        windowcdc as _wcdc,
    )

    undo = []
    for mod in (_theta, _ineq, _range, _asof, _wcdc):
        for fname in list(vars(mod)):
            fobj = vars(mod)[fname]
            if fname.endswith("_delta") and callable(fobj):

                def wrap(f=fobj):
                    def inner(*a, **kw):
                        dv = f(*a, **kw)
                        captured["dv"] = dv
                        return dv

                    return inner

                setattr(mod, fname, wrap())
                undo.append((mod, fname, fobj))
    try:
        for key in keys:
            captured.clear()
            qs[key](spark, sf_dir)
            if "dv" not in captured:
                print(f"SKIP {key}: no ivm_upsert observed", file=sys.stderr)
                continue
            dv = captured["dv"]
            plan = dv._sc._jvm.PythonSQLUtils.explainString(
                dv._jdf.queryExecution(), "formatted"
            )
            (outdir / f"{key}_dv_{suffix}.txt").write_text(plan)
            print(f"wrote {outdir / f'{key}_dv_{suffix}.txt'}")
    finally:
        engmod.IVMEngine.ivm_upsert = orig
        for mod, fname, fobj in undo:
            setattr(mod, fname, fobj)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
