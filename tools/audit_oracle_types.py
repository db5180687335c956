#!/usr/bin/env python3
"""Mechanical oracle-type audit (VERDICT r6 item 3): the driver's hash
compare is TYPE-sensitive, so a DuckDB oracle emitting HUGEINT/DECIMAL
where Spark writes int64 is a red row even when values agree (the
funnel_by_cohort r6 slip). For every query, DESCRIBE the oracle SQL in
DuckDB and diff each column's type class against the Spark parquet
output schema from a prior graft.Verify run.

Usage: python3 tools/audit_oracle_types.py [SF_DIR] [VERIFY_OUT]
(run tools/check_oracle.py first, or SKIP_RUN=1 to reuse its output).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{SF_DIR}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def type_class(t):
    """Collapse engine type names to the equivalence classes the driver's
    typed hash actually distinguishes."""
    t = str(t).upper()
    # int widths collapse: the driver's pandas read promotes every plain
    # int to int64 before hashing, so int32-vs-BIGINT is not a red class
    # (15 queries ship that way, all triple-green in r6).
    if t in ("TINYINT", "SMALLINT", "INTEGER", "INT", "INT32", "INT16",
             "INT8", "BIGINT", "INT64", "LONG"):
        return "int"
    if t in ("HUGEINT", "INT128") or t.startswith("DECIMAL"):
        return "decimal"  # never matches a Spark int64/double output
    if t in ("DOUBLE", "FLOAT", "REAL", "FLOAT32", "FLOAT64", "HALF_FLOAT"):
        return "float"
    if t in ("VARCHAR", "STRING", "TEXT", "LARGE_STRING"):
        return "string"
    if t in ("BOOLEAN", "BOOL"):
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t.startswith("DATE"):
        return "date"
    if t.startswith(("LIST", "STRUCT", "MAP")) or t.startswith(("ARRAY",)):
        return "nested"
    return t.lower()


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
bad = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not spark_files:
        print(f"SKIP {name}: no spark output")
        continue
    spark_schema = pq.read_schema(spark_files[0])
    spark_types = {f.name: type_class(f.type) for f in spark_schema}
    try:
        odesc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:
        bad.append(name)
        print(f"FAIL {name}: oracle DESCRIBE error {e}")
        continue
    oracle_types = {r[0]: type_class(r[1]) for r in odesc}
    if set(spark_types) != set(oracle_types):
        bad.append(name)
        print(f"FAIL {name}: column sets differ {sorted(spark_types)} vs {sorted(oracle_types)}")
        continue
    diffs = {
        c: (spark_types[c], oracle_types[c])
        for c in spark_types
        if spark_types[c] != oracle_types[c]
    }
    if diffs:
        bad.append(name)
        print(f"FAIL {name}: {diffs}")

if bad:
    print(f"\n{len(bad)} queries with type drift: {bad}")
    sys.exit(1)
print(f"\nall {len(oracle)} oracles type-agree with their Spark outputs")
