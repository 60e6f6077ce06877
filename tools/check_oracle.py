#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs
DuckDB oracle SQL. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
results = {}
for d in sorted(glob.glob(os.path.join(out, "q*"))):
    qname = os.path.basename(d)
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(os.path.join(d, "*.parquet"))])
    except Exception as e:
        results[qname] = f"SPARK-READ-FAIL {e}"
        continue
    if qname not in oracle:
        results[qname] = f"rows-only: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else "")
        continue
    try:
        exp = con.execute(oracle[qname]).df()
    except Exception as e:
        results[qname] = f"ORACLE-FAIL {str(e)[:160]}"
        continue
    # driver-style compare: sort columns by name, then sort rows, compare values
    g = got[sorted(got.columns)].copy()
    e = exp[sorted(exp.columns)].copy()
    if list(g.columns) != list(e.columns):
        results[qname] = f"SCHEMA-MISMATCH spark={list(g.columns)} duck={list(e.columns)}"
        continue
    if len(g) != len(e):
        results[qname] = f"ROWCOUNT-MISMATCH spark={len(g)} duck={len(e)}"
        continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    mismatch = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind == "f" or ev.dtype.kind == "f":
                import numpy as np
                ok = np.allclose(gv.astype(float), ev.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                ok = (gv.astype(str) == ev.astype(str)).all()
        except Exception as ex:
            ok = False
            mismatch = f"col {c} compare error {ex}"
        if not ok:
            mismatch = mismatch or f"col {c} differs; spark head={gv.head(3).tolist()} duck head={ev.head(3).tolist()}"
            break
    results[qname] = "OK" if mismatch is None else f"VALUE-MISMATCH {mismatch}"

fails = 0
for k in sorted(results):
    status = results[k]
    flag = "PASS" if status == "OK" or status.startswith("rows-only") and "EMPTY" not in status else "FAIL"
    if flag == "FAIL":
        fails += 1
    print(f"{flag:4} {k}: {status}")
print(f"\n{len(results)} queries, {fails} failing")
sys.exit(1 if fails else 0)
