#!/usr/bin/env python3
"""Build the full sf1 (10x) table set as key-shifted replicas of sf0.1.

Round-13 verdict ask #1 needs a FULL 257+-query bench sweep at sf1, which
needs every table — the prior sf1 corpus (round 13's scaling spot-checks)
covered documents only. Replication policy, per table:

  - region / nation: copied verbatim (TPC-H dims stay fixed across SF).
  - customer / supplier / part / orders / lineitem / events: 10 replicas
    with every key column offset by replica * (max_key + 1), so FK
    relationships hold WITHIN each replica and join fanouts scale exactly
    linearly (each replica joins only with itself).
  - part.p_name: every token suffixed `q{r}` for replicas r >= 1 — the
    fuzzy-join block keys (leading/trailing token) stay per-replica, so
    distinct-name volume, block structure, and candidate counts all scale
    10x instead of collapsing under the DISTINCT the kernel starts with.
  - documents: the round-13 scheme (kept bit-identical when the file
    already exists, for comparability with the committed spot-checks):
    every word suffixed `q{r}` for r >= 1 — per-replica dup/near-dup
    structure identical, cross-replica shingles disjoint, so near-dup
    family RATE is preserved while volume scales 10x.
  - embeddings: vec_id offset; each replica's vectors CYCLICALLY SHIFTED
    by r dimensions — a coordinate permutation preserves all
    within-replica inner products exactly (dup structure intact) while
    cross-replica cosines go near-random (no artificial 100x pair
    explosion from identical copies).

Timestamps are written as plain TIMESTAMP (micros) — same as the driver's
sf0.1 parquet; Tables.t branches on the materialized type either way.

Usage: python3 tools/make_sf1.py [src_sf_dir] [dst_dir]
"""
import pathlib
import sys

import duckdb

R = 10


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range(0, {R})) AS r")

    def src_t(name):
        return f"read_parquet('{src}/{name}.parquet')"

    def off(name, key):
        return con.execute(
            f"SELECT max({key}) + 1 FROM {src_t(name)}").fetchone()[0]

    def copy(name, select_sql):
        out = dst / f"{name}.parquet"
        con.execute(f"COPY ({select_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"[make_sf1] {name}: {n} rows")

    for dim in ("region", "nation"):
        copy(dim, f"SELECT * FROM {src_t(dim)}")

    ko = {t: off(t, k) for t, k in [
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("embeddings", "vec_id"),
        ("documents", "doc_id")]}
    uo = off("events", "user_id")

    copy("customer", f"""
        SELECT c_custkey + r * {ko['customer']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src_t('customer')}, reps""")
    copy("supplier", f"""
        SELECT s_suppkey + r * {ko['supplier']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {src_t('supplier')}, reps""")
    copy("part", f"""
        SELECT p_partkey + r * {ko['part']} AS p_partkey,
               CASE WHEN r = 0 THEN p_name
                    ELSE array_to_string(list_transform(
                      string_split(p_name, ' '), w -> w || 'q' || r), ' ')
               END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {src_t('part')}, reps""")
    copy("orders", f"""
        SELECT o_orderkey + r * {ko['orders']} AS o_orderkey,
               o_custkey + r * {ko['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src_t('orders')}, reps""")
    copy("lineitem", f"""
        SELECT l_orderkey + r * {ko['orders']} AS l_orderkey,
               l_partkey + r * {ko['part']} AS l_partkey,
               l_suppkey + r * {ko['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src_t('lineitem')}, reps""")
    copy("events", f"""
        SELECT event_id + r * {ko['events']} AS event_id, ts,
               user_id + r * {uo} AS user_id, event_type, value, props
        FROM {src_t('events')}, reps""")
    copy("embeddings", f"""
        SELECT vec_id + r * {ko['embeddings']} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_concat(embedding[r + 1:], embedding[1:r])
               END::FLOAT[] AS embedding,
               label
        FROM {src_t('embeddings')}, reps""")

    docs_out = dst / "documents.parquet"
    if docs_out.exists():
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{docs_out}')").fetchone()[0]
        print(f"[make_sf1] documents: kept existing ({n} rows, the round-13 "
              "replica corpus — bit-identical for spot-check comparability)")
    else:
        copy("documents", f"""
            SELECT doc_id + r * {ko['documents']} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(list_transform(
                          string_split(text, ' '), w -> w || 'q' || r), ' ')
                   END AS text,
                   lang, source,
                   CASE WHEN r = 0 THEN n_chars
                        ELSE len(array_to_string(list_transform(
                          string_split(text, ' '), w -> w || 'q' || r), ' '))
                   END AS n_chars
            FROM {src_t('documents')}, reps""")


if __name__ == "__main__":
    main()
