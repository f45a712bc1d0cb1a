#!/usr/bin/env python3
"""Arrow-type sweep of SparkEntry oracles vs Spark output.

Usage: python3 tools/typecheck.py <sfDir> <verifyOutDir> [query ...]

tools/check.py normalizes values, so a DuckDB HUGEINT (decimal128) vs Spark
int64 mismatch passes there but hash-mismatches in the driver's gate. This
script compares the arrow schema of each Spark parquet dump with the arrow
schema of the DuckDB oracle result and flags any per-column type difference
(after harmless unifications: string/large_string, timestamp units).
"""
import sys, json, glob, os, re
import duckdb
import pyarrow.parquet as pq


def canon(t):
    s = str(t)
    if s in ("large_string", "string"):
        return "string"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("large_list"):
        s = "list" + s[len("large_list"):]
    # list element field NAME ("element" vs "l") and nullability are
    # arrow-writer conventions, not value types — the driver's hash
    # compares python values and sees neither
    s = re.sub(r"list<[^:<>]+: ", "list<", s)
    s = s.replace(" not null", "")
    return s


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"SKIP {name} (no spark dump)")
            continue
        spark_t = pq.read_table(d)
        try:
            ora_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERR  {name}: oracle failed: {e}")
            bad += 1
            continue
        st = {f.name: canon(f.type) for f in spark_t.schema}
        ot = {f.name: canon(f.type) for f in ora_t.schema}
        if sorted(st) != sorted(ot):
            print(f"COLS {name}: spark={sorted(st)} oracle={sorted(ot)}")
            bad += 1
            continue
        diffs = {c: (st[c], ot[c]) for c in st if st[c] != ot[c]}
        if diffs:
            print(f"TYPE {name}: {diffs}")
            bad += 1
    print(f"== typecheck done, {bad} mismatching ==")


if __name__ == "__main__":
    main()
