#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify output
parquet per query, run the recorded DuckDB oracle SQL on the same
testdata dir, compare row count / column names / sorted values.

Usage: tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def table_key(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    pylist = tbl.select(cols).to_pylist()
    rows = sorted("|".join(norm(r[c]) for c in cols) for r in pylist)
    return cols, rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        gc, gr = table_key(got)
        ec, er = table_key(exp)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}"); n_fail += 1; continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} vs oracle {len(er)}"); n_fail += 1; continue
        if gr != er:
            bad = [(a, b) for a, b in zip(gr, er) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs:")
            for a, b in bad:
                print(f"   spark : {a}\n   oracle: {b}")
            n_fail += 1; continue
        print(f"PASS {name} ({len(gr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
