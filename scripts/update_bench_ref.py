"""Regenerate BENCH_REF.json from the latest local full bench run.

BENCH_REF.json holds each key's calm-machine reference time at sf0.1;
bench.py uses it to decide when a sample deserves extra re-sampling
under contention its /proc/stat probe cannot see (see bench.py).  Run
after a full `python bench.py` on a calm machine.

Policy: a key's reference is updated only from a sample whose recorded
external-cpus was under the calm threshold; keys measured under load
keep their previous reference (a load-inflated reference would defang
the guard for exactly the keys it protects).

Usage: python scripts/update_bench_ref.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CALM_EXT = 8.0


def main() -> None:
    full = json.loads((ROOT / "BENCH_FULL_local.json").read_text())
    ref_path = ROOT / "BENCH_REF.json"
    prev = (
        json.loads(ref_path.read_text())["queries"] if ref_path.exists() else {}
    )
    loads = full.get("external_cpus_at_recorded_sample", {})
    out: dict[str, float] = dict(prev)
    updated, kept = 0, 0
    for k, v in full["queries"].items():
        if v != v:  # NaN = the query errored in that run; a NaN ref
            kept += 1  # would be invalid JSON and defang the guard
            continue
        if loads.get(k, 0.0) <= CALM_EXT:
            # the guard compares against the key's best-known calm time,
            # so two calm runs resolve to their MIN (run-to-run noise on
            # a shared host only ever inflates; taking the latest would
            # slowly ratchet references up and weaken the guard)
            out[k] = min(v, prev[k]) if k in prev else v
            updated += 1
        elif k in prev:
            kept += 1
        else:
            out[k] = v  # first measurement, flagged or not — better than none
    ref_path.write_text(
        json.dumps(
            {
                "_comment": (
                    "Calm-machine per-key reference times (sec) at sf0.1 on "
                    "local[32], regenerated each round from a verified-calm "
                    "full bench run (scripts/update_bench_ref.py; keys "
                    "recorded under load keep their previous reference). "
                    "bench.py uses these ONLY to decide when a sample "
                    "deserves extra re-sampling under invisible contention; "
                    "recorded figures are always real measured runs."
                ),
                "sf": full.get("sf", 0.1),
                "queries": dict(sorted(out.items())),
            },
            indent=1,
        )
    )
    print(f"{updated} refs updated, {kept} kept (load-flagged), {len(out)} total")


if __name__ == "__main__":
    main()
