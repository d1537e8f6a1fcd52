#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads each query's Spark parquet dump (written by graft.Verify) and the
oracle_sql.json, runs the oracle SQL in DuckDB over the same testdata
parquet tables, and compares: row count, column names, and exact values
(columns sorted by name, rows in emitted order).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import math

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)          # full precision repr — strictest compare
    return repr(v)

def rows_of_table(tbl):
    # columns sorted by name, rows kept in emitted order
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, list(zip(*data)) if data else (cols, [])

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        spark_tbl = pq.read_table(files[0])
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        sc, srows = rows_of_table(spark_tbl)
        dc, drows = rows_of_table(duck_tbl)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                bad = (i, na, nb); break
        if bad:
            i, na, nb = bad
            print(f"FAIL {name}: row {i}\n  spark={na}\n  duck ={nb}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
