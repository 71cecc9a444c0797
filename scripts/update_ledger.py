"""Regenerate GRADING_LEDGER.json from the driver's CORRECTNESS_r*.json.

The ledger records, per registered query key, which rounds the driver
graded it and when it was last hash-green — so each round's 50-key
grading window (``__spark_entry__._GRADE_FIRST``) can be COMPUTED
(never-graded first, then least-recently-green) instead of
hand-maintained.  Run after each round's CORRECTNESS file lands.

Usage: python scripts/update_ledger.py
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def round_num(name: str) -> int:
    return int(re.search(r"r(\d+)", name).group(1))


def build_ledger() -> dict:
    ledger: dict[str, dict] = {}
    # numeric round order: a lexicographic sort would put r10 before r2
    # and corrupt last_green from round 10 on
    paths = sorted(
        glob.glob(str(ROOT / "CORRECTNESS_r*.json")),
        key=lambda p: round_num(Path(p).name),
    )
    for path in paths:
        rnd = re.search(r"r(\d+)", Path(path).name).group(0)
        for k, v in json.load(open(path)).items():
            e = ledger.setdefault(
                k, {"graded_rounds": [], "green_rounds": [], "last_green": None}
            )
            e["graded_rounds"].append(rnd)
            if v.get("hash_match"):
                e["green_rounds"].append(rnd)
                e["last_green"] = rnd

    import __spark_entry__ as entrymod

    for k in entrymod.queries():
        ledger.setdefault(
            k, {"graded_rounds": [], "green_rounds": [], "last_green": None}
        )
    return dict(sorted(ledger.items()))


def main() -> None:
    ledger = build_ledger()
    out = ROOT / "GRADING_LEDGER.json"
    json.dump(ledger, open(out, "w"), indent=1)
    never = [k for k, v in ledger.items() if not v["graded_rounds"]]
    stale = sorted(
        (round_num(v["last_green"] or "r0"), k)
        for k, v in ledger.items()
        if v["graded_rounds"]
    )
    print(f"{len(ledger)} keys, {len(never)} never graded: {never}")
    print("next-window suggestion (never-graded, then least-recently-green):")
    for k in never + [k for _, k in stale][: 50 - len(never)]:
        print(f"  {k}")


if __name__ == "__main__":
    main()
