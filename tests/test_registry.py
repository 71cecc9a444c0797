"""Registry invariants for the graded query surface.

Round-2 lessons (VERDICT.md r2 "What's wrong"): one registered key had
no oracle at all (sim_topk_ivf) and one returned a list-typed column the
driver's pandas canonicalizer cannot hash (text_fingerprints).  These
tests make both failure classes impossible to reintroduce without a
deliberate allowlist edit.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import __spark_entry__ as entrymod

# Keys deliberately graded rows-only (no SQL-expressible oracle).  Keep
# EMPTY unless a genuinely non-SQL-expressible op lands; each entry needs
# a comment saying why.
ROWS_ONLY_ALLOWLIST: frozenset[str] = frozenset()


def test_every_registered_key_has_an_oracle():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = [k for k in q if k not in o and k not in ROWS_ONLY_ALLOWLIST]
    assert not missing, f"queries without oracle_sql entries: {missing}"


def test_no_orphan_oracles():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    orphans = [k for k in o if k not in q]
    assert not orphans, f"oracle_sql entries with no query: {orphans}"


def test_grading_window_is_50_unique_registered_keys():
    q = entrymod.queries()
    window = entrymod._GRADE_FIRST
    assert len(window) == 50
    assert len(set(window)) == 50
    unknown = [k for k in window if k not in q]
    assert not unknown, f"window keys not registered: {unknown}"
    # declaration order must actually put the window first (the driver
    # grades the first 50 declared keys)
    assert tuple(list(q)[:50]) == window


def test_ledger_covers_every_registered_key():
    ledger = json.load(open(ROOT / "GRADING_LEDGER.json"))
    q = entrymod.queries()
    missing = [k for k in q if k not in ledger]
    assert not missing, (
        f"keys missing from GRADING_LEDGER.json (run scripts/update_ledger.py):"
        f" {missing}"
    )


def test_window_queries_return_driver_hashable_schemas(spark):
    """No top-level array/map/struct columns in any graded-window query:
    the driver canonicalizes results through pandas sort/factorize, which
    raises 'unhashable type' on list-valued cells (CORRECTNESS_r02,
    text_fingerprints).  Schema-only check — queries that are cheap plan
    constructions stay lazy; lifecycle queries run at sf0.001."""
    from pyspark.sql import types as T

    sf_dir = "/root/testdata/sf0.001"
    bad = []
    qs = entrymod.queries()
    for name in entrymod._GRADE_FIRST:
        df = qs[name](spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"driver-unhashable output columns: {bad}"


# --------------------------------------------------------------------------
# bench-reference updater (scripts/update_bench_ref.py v2) — pure merge
# logic: calm-min guard, median fallback on drift, src-hash rebaseline,
# provisional parking for load-flagged first measurements (ADVICE r6)
# --------------------------------------------------------------------------

sys.path.insert(0, str(ROOT / "scripts"))
from update_bench_ref import merge_run, modules_for  # noqa: E402


def test_bench_ref_first_calm_run_sets_min():
    out, counts = merge_run({}, {"k": 5.0}, {"k": 0.0}, {"k": "h1"})
    assert out["queries"]["k"] == 5.0
    assert out["stats"]["k"]["samples"] == [5.0]
    assert not out["provisional"]
    assert counts["updated"] == 1


def test_bench_ref_flagged_first_measurement_is_provisional():
    """ADVICE r6: a load-flagged first measurement must NOT become the
    reference (it would defang the resampling guard for that key)."""
    out, counts = merge_run({}, {"k": 40.0}, {"k": 20.0}, {"k": "h1"})
    assert "k" not in out["queries"]
    assert out["provisional"]["k"] == 40.0
    assert counts["provisional"] == 1
    # promoted (and cleared from provisional) on the first calm run
    out2, _ = merge_run(out, {"k": 5.0}, {"k": 0.0}, {"k": "h1"})
    assert out2["queries"]["k"] == 5.0
    assert "k" not in out2["provisional"]


def test_bench_ref_min_ratchet_and_median_fallback():
    ref: dict = {}
    for v in (6.0, 5.0, 9.0):
        ref, _ = merge_run(ref, {"k": v}, {"k": 0.0}, {"k": "h1"})
    st = ref["stats"]["k"]
    assert st["min"] == 5.0 and st["median"] == 6.0
    # 6.0/5.0 = 1.2 <= 1.5 → guard stays at the min
    assert not st["gap_flagged"] and ref["queries"]["k"] == 5.0
    # the min drifts >1.5x under the median → guard switches to median
    for v in (9.0, 9.0, 9.0, 9.0, 9.0):
        ref, _ = merge_run(ref, {"k": v}, {"k": 0.0}, {"k": "h1"})
    st = ref["stats"]["k"]
    assert st["gap_flagged"] and ref["queries"]["k"] == st["median"]


def test_bench_ref_src_change_forces_fresh_baseline():
    """verdict r6 #7: a minimum measured against old code must not be
    inherited after the key's code path changed."""
    ref, _ = merge_run({}, {"k": 2.0}, {"k": 0.0}, {"k": "h1"})
    ref, counts = merge_run(ref, {"k": 8.0}, {"k": 0.0}, {"k": "h2"})
    assert counts["rebaselined"] == 1
    assert ref["stats"]["k"]["samples"] == [8.0]
    assert ref["queries"]["k"] == 8.0  # NOT min(2.0, 8.0)


def test_bench_ref_loaded_later_run_keeps_prior_ref():
    ref, _ = merge_run({}, {"k": 2.0}, {"k": 0.0}, {"k": "h1"})
    ref2, counts = merge_run(ref, {"k": 30.0}, {"k": 20.0}, {"k": "h1"})
    assert ref2["queries"]["k"] == 2.0
    assert counts["kept"] == 1


def test_bench_ref_module_map_covers_registered_keys():
    for k in entrymod.queries():
        mods = modules_for(k)
        assert mods, k
        for f in mods:
            assert (ROOT / f).exists(), f"{k}: mapped module {f} missing"
