"""Emit the cumulative driver-evidence ledger as a markdown table.

One row per registered query: its per-round driver verdict (from the
CORRECTNESS_r*.json files the grading harness writes) plus whether it
sits in the current 50-entry check window. Regenerate the COVERAGE.md
section with:

    python scripts/coverage_ledger.py > /tmp/ledger.md
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accident_prediction_montreal_spark.plans import REGISTRY  # noqa: E402


def _verdict(rec: dict) -> str:
    if rec.get("err"):
        return "ERR"
    if rec.get("hash_match"):
        return "green"
    if rec.get("rows_match") and rec.get("hash_match") is None:
        return "rows-only green"
    if rec.get("rows_match") and not rec.get("hash_match"):
        return "rows-only green" if rec.get("schema_match") is None else "HASH-FAIL"
    return "FAIL"


def main() -> None:
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        tag = re.search(r"r(\d+)", path).group(1)
        rounds[f"r{tag}"] = json.load(open(path))

    window = set(list(REGISTRY)[:50])
    names = sorted(REGISTRY)
    cols = sorted(rounds)
    print("| query | " + " | ".join(cols) + " | r-next window |")
    print("|---|" + "---|" * (len(cols) + 1))
    ever = 0
    for name in names:
        row = []
        seen = False
        for c in cols:
            rec = rounds[c].get(name)
            row.append("—" if rec is None else _verdict(rec))
            seen = seen or rec is not None
        ever += seen
        row.append("in-window" if name in window else "tail")
        print(f"| {name} | " + " | ".join(row) + " |")
    checked_next = len(window | {n for n in names if any(rounds[c].get(n) for c in cols)})
    print(
        f"\nEver driver-checked through {cols[-1]}: {ever}/{len(names)}; "
        f"after the next run (current window): {checked_next}/{len(names)}."
    )


if __name__ == "__main__":
    main()
