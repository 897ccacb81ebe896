#!/usr/bin/env python3
"""Compose the adversarial-skew axis with the second scaling decade.

The round-24 skew sweep (BENCH_SKEW.json) ran at sf1; the round-16 verdict
asks whether the same defenses (df caps, reps-collapse, map-side combine)
hold a DECADE higher. This applies make_sf1_skew's documents transform —
one near-dup template family at 5% of docs, half of it ONE exact text, so
the hot fingerprint is 2.5% of the corpus — to the sf10 documents corpus
(/tmp/sf10 from make_sf10_docs.py, 500k docs): same family predicate
(doc_id % 20 == 7 -> 25,000 family docs, 12,500 on the single hot
fingerprint), so the ABSOLUTE hot-key mass is 10x the sf1 sweep's while
the relative rates match exactly.

Only documents.parquet is written (the sf10 corpus is documents-only);
run the near-dup/graph subset with SPARK_GRAFT_QUERIES.

Usage: python3 tools/make_sf10_skew.py [src_sf10_dir] [dst_dir]
"""
import pathlib
import sys

import duckdb

from make_sf1_skew import template_sql


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    dst = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10skew")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % 20 = 7 THEN {template_sql()}
                      ELSE text END AS text,
                 lang, source,
                 CASE WHEN doc_id % 20 = 7 THEN len({template_sql()})
                      ELSE n_chars END AS n_chars
          FROM read_parquet('{src}/documents.parquet')
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    n, fam, hot = con.execute(
        f"""SELECT count(*),
                   sum(CASE WHEN doc_id % 20 = 7 THEN 1 ELSE 0 END),
                   (SELECT max(c) FROM (SELECT count(*) AS c
                    FROM read_parquet('{dst}/documents.parquet')
                    GROUP BY text))
            FROM read_parquet('{dst}/documents.parquet')""").fetchone()
    print(f"[make_sf10_skew] documents: {n} rows, {fam} in the template "
          f"family, hottest exact text = {hot} copies")


if __name__ == "__main__":
    main()
