#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query result parquet, runs the oracle SQL in DuckDB over the same
source tables, sorts columns by name, sorts rows, and compares values
(exact for non-floats; tiny-epsilon for floats to spot borderline rounding).
"""
import sys, json, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = []
for name, sql in sorted(oracle.items()):
    res_dir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(res_dir, "*.parquet"))
    if not files:
        fails.append((name, "no spark result written"))
        continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = con.sql(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"query error: {e}"))
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((name, f"schema cols: spark={gcols} oracle={ecols}"))
        continue
    got, exp = got[gcols], exp[ecols]
    gt = [str(t) for t in got.dtypes]
    et = [str(t) for t in exp.dtypes]
    if gt != et:
        fails.append((name, f"dtypes: spark={list(zip(gcols,gt))} oracle={list(zip(ecols,et))}"))
        # keep going — value compare still informative
    if len(got) != len(exp):
        fails.append((name, f"rowcount: spark={len(got)} oracle={len(exp)}"))
        continue
    key = [c for c in gcols]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    bad = None
    for c in gcols:
        gv, ev = g[c], e[c]
        if str(gv.dtype).startswith("float") or str(ev.dtype).startswith("float"):
            import numpy as np
            gn, en = gv.astype(float), ev.astype(float)
            mask = ~(np.isclose(gn, en, rtol=0, atol=1e-9, equal_nan=True))
            if mask.any():
                i = int(np.argmax(np.asarray(mask)))
                bad = (c, i, gn.iloc[i], en.iloc[i]); break
        else:
            neq = (gv.astype(str) != ev.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                bad = (c, i, gv[i], ev[i]); break
    if bad:
        fails.append((name, f"value mismatch col={bad[0]} row={bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}"))
    else:
        print(f"  OK  {name} ({len(got)} rows)")
if fails:
    print("\nFAILURES:")
    for n, m in fails:
        print(f"  FAIL {n}: {m}")
    sys.exit(1)
print("all queries match")
