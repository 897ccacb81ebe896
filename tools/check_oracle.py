#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sf-dir parquet tables, loads the Spark result parquet from <outDir>/<name>/,
sorts columns by name, and compares row-by-row with exact equality
(mirroring the driver's row/schema/hash check as closely as we can).

Usage: python3 tools/check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    no_oracle = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        got_rel = con.execute(f"SELECT * FROM read_parquet('{files[0]}')")
        got = got_rel.fetchall()
        got_cols = [d[0] for d in con.description]
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            n_fail += 1
            continue
        # sort columns by name (driver behavior)
        gperm = [got_cols.index(c) for c in sorted(got_cols)]
        wperm = [want_cols.index(c) for c in sorted(want_cols)]
        g = [tuple(norm(r[i]) for i in gperm) for r in got]
        w = [tuple(norm(r[i]) for i in wperm) for r in want]
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first at {i}:")
            print(f"  cols:   {sorted(got_cols)}")
            print(f"  spark:  {a}")
            print(f"  oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # queries with no oracle (rows-only in the driver)
    qdirs = {p.split('/')[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith('.json')}
    no_oracle = sorted(qdirs - set(oracle))
    if no_oracle:
        print(f"rows-only (no oracle): {no_oracle}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
