#!/usr/bin/env python3
"""Build an sf10 (100x sf0.1) DOCUMENTS corpus for the second scaling decade.

The sf1 sweep (BENCH_SF1.json) measures one decade (sf0.1 -> sf1, 10x).
This builds the next one for the LLM-pipeline families that read ONLY the
documents table (text_*, dedup_*, graph_*, prep_filter_stack): 10 replicas
of /tmp/sf1/documents.parquet (500k docs, ~10x chars), second-level word
suffix `p{s}` for replicas s >= 1 on top of sf1's `q{r}`:

  - within-replica dup/near-dup structure identical to sf1 (so the near-dup
    family RATE is preserved while volume scales 10x again);
  - cross-replica shingles/words disjoint at BOTH levels (q-suffix separates
    the 10 sf1 replicas, p-suffix separates the 10 sf10 replicas), so no
    artificial cross-replica pair explosion anywhere in the 100 replicas.

Only documents.parquet is written — bench runs against /tmp/sf10 must
restrict to documents-only queries via SPARK_GRAFT_QUERIES.

Edge case, INTENTIONAL and shared with make_sf100_docs.py: an empty-text
source row becomes the literal one-word doc 'p{s}' in replicas s >= 1
(string_split('', ' ') yields [''], so the suffix attaches to the empty
word). Kept for cross-decade consistency with the committed BENCH_SF10/
BENCH_SF100 artifacts — do not change without regenerating both.

Usage: python3 tools/make_sf10_docs.py [src_sf1_dir] [dst_dir]
"""
import pathlib
import sys

import duckdb

R = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    dst = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(generate_series(0, {R - 1})) AS s")
    src_docs = f"read_parquet('{src}/documents.parquet')"
    (koff,) = con.execute(f"SELECT max(doc_id) + 1 FROM {src_docs}").fetchone()
    # suffix once in the inner select, derive n_chars from the SAME expression
    # (a duplicated transform could silently drift between text and n_chars)
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang, source, len(text) AS n_chars
          FROM (
            SELECT doc_id + s * {koff} AS doc_id,
                   CASE WHEN s = 0 THEN text
                        ELSE array_to_string(list_transform(
                          string_split(text, ' '), w -> w || 'p' || s), ' ')
                   END AS text,
                   lang, source
            FROM {src_docs}, reps)
          ORDER BY doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"[make_sf10_docs] documents: {n} rows -> {dst}/documents.parquet")


if __name__ == "__main__":
    main()
