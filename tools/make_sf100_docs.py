#!/usr/bin/env python3
"""Build an sf100 (1000x sf0.1) DOCUMENTS corpus — the THIRD scaling decade.

Same construction as make_sf10_docs.py one level up: 10 replicas of
/tmp/sf10/documents.parquet (5M docs total), third-level word suffix
`r{s}` for replicas s >= 1 on top of sf10's `p{s}` and sf1's `q{r}`:

  - within-replica dup/near-dup structure identical to sf10 (near-dup
    family RATE preserved while volume scales 10x again — 1000 replicas
    of the sf0.1 structure in total);
  - cross-replica shingles/words disjoint at ALL THREE levels, so no
    artificial cross-replica pair explosion anywhere.

Only documents.parquet is written (~580 MB parquet) — bench runs against
/tmp/sf100 must restrict to documents-only queries via SPARK_GRAFT_QUERIES,
and the per-query watchdog needs raising (SPARK_GRAFT_QUERY_TIMEOUT=1800).

Edge case, INTENTIONAL and shared with make_sf10_docs.py (cross-decade
consistency beats prettiness): an empty-text source row becomes the literal
one-word doc 'r{s}' in replicas s >= 1, because DuckDB's
string_split('', ' ') yields [''] and the suffix attaches to that empty
word. Replica copies of empty docs therefore form small per-replica exact-
dup families of their own instead of joining the source empty-doc family.
Do NOT "fix" this here without regenerating every committed decade artifact
(BENCH_SF10/BENCH_SF100) against the changed corpus.

Usage: python3 tools/make_sf100_docs.py [src_sf10_dir] [dst_dir]
"""
import pathlib
import sys

import duckdb

R = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    dst = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(generate_series(0, {R - 1})) AS s")
    src_docs = f"read_parquet('{src}/documents.parquet')"
    (koff,) = con.execute(f"SELECT max(doc_id) + 1 FROM {src_docs}").fetchone()
    # suffix once in the inner select, derive n_chars from the SAME
    # expression (the make_sf10 lesson: a duplicated transform can drift)
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang, source, len(text) AS n_chars
          FROM (
            SELECT doc_id + s * {koff} AS doc_id,
                   CASE WHEN s = 0 THEN text
                        ELSE array_to_string(list_transform(
                          string_split(text, ' '), w -> w || 'r' || s), ' ')
                   END AS text,
                   lang, source
            FROM {src_docs}, reps)
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"[make_sf100_docs] documents: {n} rows -> {dst}/documents.parquet")


if __name__ == "__main__":
    main()
