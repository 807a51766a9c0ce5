"""Merge per-chunk MAROS_r03 artifacts into the final MAROS_r03.json.

The corpus is run in isolating chunks on the tunneled chip (a monolithic
run is vulnerable to losing everything to one TPU-worker hiccup); this
merges their rows, recomputes the summary fields, and keeps the
unavailable/pending accounting from MM_INDEX.json.

Usage: python tools/merge_maros_chunks.py OUT chunk1.json chunk2.json ...
"""

from __future__ import annotations

import json
import os
import sys

INDEX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "data", "maros_mm", "MM_INDEX.json")


def main():
    out, *chunks = sys.argv[1:]
    rows = []
    seen = set()
    base = None
    for path in chunks:
        with open(path) as f:
            art = json.load(f)
        if base is None:
            base = art
        for r in art["rows"]:
            if r["name"] in seen:
                raise SystemExit(f"duplicate problem {r['name']} in {path}")
            seen.add(r["name"])
            rows.append(r)
    rows.sort(key=lambda r: r["name"])
    npass = sum(r["pass"] for r in rows)
    merged = dict(base)
    # The accounting must come from the CURRENT index, not whichever
    # chunk happened to be first (chunks embed the accounting as of
    # their run date; the corpus grows between chunk runs).
    with open(INDEX) as f:
        index = json.load(f)
    merged["unavailable"] = index["unavailable"]
    merged["counts"] = index["counts"]
    merged.update(
        problems=len(rows),
        passed=npass,
        pass_rate=npass / max(len(rows), 1),
        published_obj_matches=sum(1 for r in rows if r.get("obj_match")),
        polish_success=sum(1 for r in rows if r.get("status_polish") == 1),
        polish_fail=sum(1 for r in rows if r.get("status_polish") == -1),
        f64_fallback_used=sum(1 for r in rows if r.get("fallback")),
        total_time=round(sum(a for a in (
            json.load(open(p))["total_time"] for p in chunks)), 1),
        chunks=chunks,
        rows=rows,
    )
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({k: merged[k] for k in (
        "problems", "passed", "pass_rate", "published_obj_matches",
        "polish_success", "polish_fail", "f64_fallback_used",
        "total_time")}))


if __name__ == "__main__":
    main()
