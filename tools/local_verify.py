import duckdb, json, sys, glob, os
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
con = duckdb.connect()
con.sql("SET threads TO 32")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

fails = []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    files = glob.glob(f'{d}/*.parquet')
    if not files:
        print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
    spark_df = con.sql(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracle:
        print(f'{name}: rows-only ({len(spark_df)} rows)'); continue
    try:
        odf = con.sql(oracle[name]).df()
    except Exception as e:
        print(f'{name}: ORACLE FAIL {str(e)[:200]}'); fails.append(name); continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = odf.reindex(sorted(odf.columns), axis=1)
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    ok_vals = False
    if ok_rows and ok_schema:
        try:
            s2 = s.sort_values(list(s.columns)).reset_index(drop=True)
            o2 = o.sort_values(list(o.columns)).reset_index(drop=True)
            for c in s.columns:
                sv, ov = s2[c], o2[c]
                try: ov = ov.astype(sv.dtype)
                except Exception: pass
                if not sv.equals(ov):
                    neq = (sv != ov) & ~(sv.isna() & ov.isna())
                    if neq.any():
                        i = neq.idxmax()
                        print(f'  {name}.{c}: first diff at row {i}: spark={sv[i]!r} oracle={ov[i]!r}')
                        break
            else:
                ok_vals = True
        except Exception as e:
            print(f'  {name}: compare error {e}')
    status = 'OK' if (ok_rows and ok_schema and ok_vals) else f'MISMATCH rows={ok_rows}({len(s)}/{len(o)}) schema={ok_schema} vals={ok_vals}'
    if status != 'OK': fails.append(name)
    print(f'{name}: {status}')
print(f'\n{len(fails)} failures: {fails}')
