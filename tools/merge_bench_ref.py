#!/usr/bin/env python3
"""Merge per-query medians for NEW queries into the frozen BENCH_REF.json.

Usage: tools/merge_bench_ref.py BENCH_REF.json /tmp/bench_draw_*.json

Existing reference entries stay FROZEN (the whole point of the reference:
it must not loosen as the surface grows); only queries absent from the
table gain an entry, valued at their per-query median across the given
draws. Prints the merged document to stdout.
"""
import json
import statistics
import sys


def main(ref_path, draw_paths):
    with open(ref_path) as f:
        ref = json.load(f)
    draws = []
    for p in draw_paths:
        with open(p) as f:
            draws.append(json.loads(f.readline()))
    names = set(draws[0]["queries"])
    for d in draws[1:]:
        if set(d["queries"]) != names:
            sys.exit(f"query sets differ across draws: {set(d['queries']) ^ names}")
    missing = sorted(names - set(ref["queries"]))
    for name in missing:
        ref["queries"][name] = round(
            statistics.median(d["queries"][name] for d in draws), 4)
    ref["total"] = round(sum(ref["queries"].values()), 2)
    prov = ref.get("provenance", "")
    ref["provenance"] = (prov + ("; " if prov else "") +
        f"same-binary session medians merged for {len(missing)} new queries: " +
        ", ".join(missing))
    json.dump(ref, sys.stdout, indent=1)
    print()
    print(f"[merge] added {len(missing)}: {missing}", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
