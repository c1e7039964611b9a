#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate: run after `sbt "runMain
graft.Verify <sfDir> <outDir>"`, compares each query's parquet dump against
the DuckDB oracle on the same tables. Dev-only tool (not part of the shipped
library).

Usage: python3 dev/check.py <sfDir> <outDir>
       python3 dev/check.py --sf 0.1 <outDir>   # /root/testdata/sf0.1

The --sf form exists for oracle spot-runs ABOVE the driver's sf0.01 gate:
the statistics-gated operators (x2_jaccard_*, x2_containment_*, the
HammingJoin family) may choose a different plan at sf0.1 than at sf0.01,
so one recorded sf0.1 run (with SPARK_GRAFT_CONF forcing the alternate
path where needed) closes the loop that spec-level plan-parity tests open.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

args = sys.argv[1:]
if args and args[0] == "--sf":
    sfdir, outdir = f"/root/testdata/sf{args[1]}", args[2]
else:
    sfdir, outdir = args[0], args[1]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # ScaleCorpus writes each table as a DIRECTORY of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad, skipped = [], [], []
for name in sorted(oracle):
    sql = oracle[name]
    spark_path = f"{outdir}/{name}"
    if not os.path.isdir(spark_path):
        bad.append((name, "spark output missing"))
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    got = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    # driver semantics: sort columns by name, then compare
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        bad.append((name, f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        bad.append((name, f"row count differs: oracle={len(exp)} spark={len(got)}"))
        continue
    # dtype check (loose: compare kind after pyarrow->pandas)
    dt_mismatch = [(c, str(exp[c].dtype), str(got[c].dtype)) for c in exp.columns
                   if exp[c].dtype.kind != got[c].dtype.kind]
    # row-order-sensitive exact compare
    mism = None
    for c in exp.columns:
        e, g = exp[c].values, got[c].values
        if exp[c].dtype.kind == 'f':
            eq = (e == g) | (pd.isna(e) & pd.isna(g))
        else:
            ee, gg = pd.Series(e).astype(object), pd.Series(gg_ := g).astype(object)
            eq = (ee.fillna("\0NULL") == gg.fillna("\0NULL")).values
        if not eq.all():
            i = int(np.argmin(eq))
            mism = f"col {c} first diff at row {i}: oracle={e[i]!r} spark={g[i]!r} ({int((~eq).sum())} rows differ)"
            break
    if mism:
        bad.append((name, mism))
    elif dt_mismatch:
        bad.append((name, f"dtype mismatch {dt_mismatch}"))
    else:
        ok.append(name)

no_oracle = [os.path.basename(d) for d in glob.glob(f"{outdir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
print(f"== OK ({len(ok)}): {' '.join(ok)}")
print(f"== NO-ORACLE ({len(no_oracle)}): {' '.join(sorted(no_oracle))}")
print(f"== BAD ({len(bad)}):")
for n, why in bad:
    print(f"  {n}: {why}")
sys.exit(1 if bad else 0)
