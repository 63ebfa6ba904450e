#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the parquet dumped by
graft.Verify. Usage: tools/check.py <sfDir> <verifyOutDir>"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d))
fails = 0
for name in names:
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    if name not in oracle:
        status = "rows-only"
        ok = len(got) > 0
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {status} rows={len(got)}")
        if not ok: fails += 1
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    ok = True; msgs = []
    if sorted(got.columns) != sorted(exp.columns):
        ok = False; msgs.append(f"schema {sorted(got.columns)} vs {sorted(exp.columns)}")
    elif len(got) != len(exp):
        ok = False; msgs.append(f"rows {len(got)} vs {len(exp)}")
    else:
        cols = sorted(got.columns)
        g = got[cols]; e = exp[cols]
        for c in cols:
            gv, ev = g[c].tolist(), e[c].tolist()
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev))
                     if (a != b and not (a is None and b is None)
                         and str(a) != str(b))]
            if diffs:
                ok = False
                msgs.append(f"col {c}: {len(diffs)} diffs, first: {diffs[0]}")
    print(f"{'ok  ' if ok else 'FAIL'} {name}: rows={len(got)}" + ("; " + "; ".join(msgs) if msgs else ""))
    if not ok: fails += 1
print(f"\n{len(names) - fails}/{len(names)} pass")
sys.exit(1 if fails else 0)
