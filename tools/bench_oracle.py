#!/usr/bin/env python3
"""External performance anchor: time the DuckDB oracle side of selected
queries against the same parquet tables the Spark bench reads.

The reference publishes no throughput numbers, so the driver's "within 2x
of baseline" gate needs a denominator. DuckDB executing the EXACT oracle
SQL (the same SQL the correctness gate trusts) on the same data is the
honest single-node anchor: a mature vectorized OLAP engine, all cores,
same machine.

Usage:
  python3 tools/bench_oracle.py <sfDir> <oracle_sql.json> [query ...]

Prints one line per query (median of 3 runs) plus a JSON summary; paste
into BASELINE.md.
"""
import sys, json, time, statistics
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    oracle = json.load(open(oracle_path))
    names = only if only else sorted(oracle)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    out = {}
    for name in names:
        if name not in oracle:
            print(f"{name:24s} (no oracle sql)")
            continue
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            runs.append(time.perf_counter() - t0)
        med = statistics.median(runs)
        out[name] = round(med, 3)
        print(f"{name:24s} {med:7.3f} s  (runs: {', '.join(f'{r:.3f}' for r in runs)})")
    print(json.dumps({"sf": sf_dir, "engine": "duckdb",
                      "threads": "default(all cores)", "oracle_sec": out}))


if __name__ == "__main__":
    main()
