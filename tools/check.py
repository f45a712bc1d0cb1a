#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (mimics the driver's t2 gate).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, and compares: column names (sorted), row counts, and
values (rows sorted, floats compared with tolerance).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import math

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v

def rows_of(table):
    cols = sorted(table.column_names)
    data = [table.column(c).to_pylist() for c in cols]
    if not data:
        return cols, []
    # Normalize BEFORE sorting so tolerance-equal floats order identically
    # on both sides; sort key is the stringified normalized tuple.
    rows = [tuple(norm(v) for v in r) for r in zip(*data)]
    return cols, sorted(rows, key=lambda r: tuple(str(x) for x in r))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pdir = os.path.join(out_dir, name)
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_t = pq.read_table(pdir)
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sc, sr = rows_of(spark_t)
        dc, dr = rows_of(duck_t)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(sr, dr)):
            if a != b:  # rows are already normalized by rows_of
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
