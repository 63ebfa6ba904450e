#!/usr/bin/env python3
"""Freeze BENCH_REF.json from N bench draws (first JSON line of each file).

Usage: tools/freeze_bench_ref.py /tmp/bench_draw_*.json > BENCH_REF.json

Takes the per-query MEDIAN across draws (odd N recommended), so one
host-steal spike in any single draw cannot define a query's reference
number. Emits provenance (draw totals, date, protocol) alongside the table.
"""
import json
import statistics
import sys


def main(paths):
    draws = []
    for p in paths:
        with open(p) as f:
            rec = json.loads(f.readline())
        draws.append(rec)
    names = set(draws[0]["queries"])
    for d in draws[1:]:
        if set(d["queries"]) != names:
            sys.exit(f"query sets differ across draws: {set(d['queries']) ^ names}")
    table = {
        name: round(statistics.median(d["queries"][name] for d in draws), 4)
        for name in sorted(names)
    }
    out = {
        "metric": "bench_ref",
        "protocol": "per-query median-of-3 within a draw; per-query median across draws",
        "draws": [round(d["value"], 2) for d in draws],
        "sf": draws[0]["sf"],
        "total": round(sum(table.values()), 2),
        "queries": table,
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
