#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
given SF, then run each oracle SQL in DuckDB over the same parquet tables
and compare (columns sorted by name, rows sorted, exact value match)."""
import json, subprocess, sys, glob, os
import duckdb, pandas as pd, numpy as np

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
SKIP_RUN = os.environ.get("SKIP_RUN") == "1"

if not SKIP_RUN:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    sys.stdout.write(r.stdout[-3000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-3000:]); sys.exit(1)

con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    sdf = con.execute(
        f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error {e}"); continue
    sdf = sdf[sorted(sdf.columns)]
    odf = odf[sorted(odf.columns)]
    if list(sdf.columns) != list(odf.columns):
        fails.append(name)
        print(f"FAIL {name}: cols {list(sdf.columns)} vs {list(odf.columns)}")
        continue
    sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    odf = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    if len(sdf) != len(odf):
        fails.append(name); print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}"); continue
    ok = True
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        if np.issubdtype(sdf[c].dtype, np.floating):
            eq = np.isclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = (pd.isna(a) & pd.isna(b)) | (a == b)
            if not eq.all():
                ok = False
                bad = np.where(~eq)[0][:3]
                print(f"FAIL {name}.{c}: e.g. {a[bad]} vs {b[bad]} maxdiff={np.nanmax(np.abs(a.astype(float)-b.astype(float)))}")
            elif not (exact | (pd.isna(a) & pd.isna(b))).all():
                print(f"WARN {name}.{c}: equal by isclose but not bitwise")
        else:
            same = (pd.isna(a) & pd.isna(b)) | (a == b)
            if not same.all():
                ok = False
                bad = np.where(~same)[0][:3]
                print(f"FAIL {name}.{c}: e.g. {a[bad]!r} vs {b[bad]!r}")
    if ok:
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        fails.append(name)
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
