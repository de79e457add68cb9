#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against DuckDB running oracle_sql.json on
the same sf tables. Dev tool only — not part of the shipped library.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pq.read_table(files[0]).to_pandas()
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fail += 1
        continue
    # driver-style: sort columns by name, compare shapes then values
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1
        continue
    if got.shape != exp.shape:
        print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
        fail += 1
        continue
    mismatch = None
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        if gv != ev:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b]
            mismatch = (c, diffs[:5])
            break
    if mismatch:
        print(f"FAIL {name}: col {mismatch[0]} diffs {mismatch[1]}")
        fail += 1
    else:
        ok += 1
        print(f"OK   {name} ({got.shape[0]} rows)")

# queries without oracle = rows-only check
all_outputs = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
for name in sorted(all_outputs - set(oracle)):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = pq.read_metadata(files[0]).num_rows if files else 0
    print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'FAIL(empty)'}")
    if n > 0: ok += 1
    else: fail += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
