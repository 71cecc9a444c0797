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
