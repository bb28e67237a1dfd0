#!/usr/bin/env python3
"""Dev-only oracle parity checker (mimics the driver's DuckDB compare).

Usage: python3 dev/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet dirs written by graft.Verify plus
<outDir>/oracle_sql.json, replays each oracle SQL in DuckDB over the
same sf tables, and compares (schema-insensitively: columns sorted by
name, rows sorted, values compared with exact/almost-equal logic).

This is development tooling only — the shipped Scala library has no
Python dependency.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    # driver data is one file per table; ScaleData output is a
    # directory of part files under the same <name>.parquet path
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: cols {sorted(got.columns)} vs {sorted(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    bad = []
    for c in g.columns:
        gv, ev = g[c], e[c]
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            ok = np.allclose(gv.fillna(-9e99).astype(float), ev.fillna(-9e99).astype(float),
                             rtol=0, atol=0)  # exact: we engineered determinism
            if not ok:
                mism = (gv.fillna(-9e99).astype(float) != ev.fillna(-9e99).astype(float))
                bad.append((c, int(mism.sum()), 'float', gv[mism].head(3).tolist(), ev[mism].head(3).tolist()))
        else:
            gs, es = gv.astype(str), ev.astype(str)
            if not (gs == es).all():
                mism = gs != es
                bad.append((c, int(mism.sum()), str(gv.dtype)+'/'+str(ev.dtype),
                            gv[mism].head(3).tolist(), ev[mism].head(3).tolist()))
    if bad:
        print(f"FAIL {name}: {bad}"); fails += 1
    else:
        dtypes_differ = [(c, str(got[c].dtype), str(exp[c].dtype))
                         for c in g.columns if str(g[c].dtype) != str(e[c].dtype)]
        note = f" [dtype diff: {dtypes_differ}]" if dtypes_differ else ""
        print(f"PASS {name} ({len(got)} rows){note}")

extra = [q for q in sorted(set(d.split('/')[-1] for d in glob.glob(f'{out_dir}/*') if os.path.isdir(d)))
         if q not in oracle]
if extra:
    print("rows-only queries (no oracle):")
    for q in extra:
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else -1
        print(f"  {q}: {n} rows")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
