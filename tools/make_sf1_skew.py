#!/usr/bin/env python3
"""Build the ADVERSARIAL-SKEW sf1 variant (round-24 verdict ask #1).

Both scaling corpora (make_sf1 / make_sf10_docs) preserve dup/near-dup rates
uniformly; a real 100 TB crawl does not — it has a hot template family and a
hot key. This builds /tmp/sf1skew from /tmp/sf1 with the SAME row counts and
~same total volume per table, differing only in skew:

  - documents: 5% of docs (doc_id % 20 == 7, 2500 of 50k) REPLACED by one
    near-dup TEMPLATE FAMILY: 51 shared template words + 3 variant words,
    54 words/doc = the corpus mean, n_chars recomputed from the new text.
    Variant 0 holds HALF the family (1250 docs = 2.5% of the corpus on ONE
    exact text/fingerprint — the single hot fingerprint); the other half
    spreads over ~150 distinct variants x ~8 exact copies.
    The family is simultaneously: a hot shingle set (template 4-grams hit
    all 2500 docs -> the dedup_ngram df cap and dedup_winnowing df cap must
    fire), a hot exact-dup cluster set (copies collapse in simhashNearPairs'
    reps step), and a hot band bucket (variants share most simhash bits ->
    band join buckets concentrate).
  - events: 10% of events (event_id % 10 == 3, 100k of 1M) reassigned to
    ONE user (user_id = 42, vs the uniform corpus max of 99 events/user) —
    the hot window-partition / hot groupBy key. Everything else unchanged.
  - all other tables: copied verbatim (the skew sweep's query subset reads
    documents + events only, but Bench wants a full table set).

The control protocol mirrors BENCH_SF10: a SAME-SESSION uniform-sf1 triple
of the IDENTICAL query subset is the denominator, so ambient band and subset
inflation cancel in the ratios.

Usage: python3 tools/make_sf1_skew.py [src_sf1_dir] [dst_dir]
"""
import pathlib
import shutil
import sys

import duckdb

N_VARIANTS = 300
TEMPLATE_WORDS = 54  # corpus mean words/doc
VARIANT_POSITIONS = (17, 35, 53)  # 0-based slots the variant words occupy


def template_sql() -> str:
    """SQL expression producing the family text for a doc_id."""
    words = []
    for i in range(TEMPLATE_WORDS):
        if i in VARIANT_POSITIONS:
            tag = "abc"[VARIANT_POSITIONS.index(i)]
            # (doc_id // 20) walks consecutively over the family's members,
            # so % N_VARIANTS really yields N_VARIANTS distinct variants
            # (doc_id % N_VARIANTS would collapse to gcd-structured residues).
            # EVEN members all take variant 0: ONE exact text (and so one
            # fingerprint) holds half the family = 2.5% of the corpus — the
            # judge-specified single hot fingerprint.
            words.append(
                f"'v{tag}' || (CASE WHEN (doc_id // 20) % 2 = 0 THEN 0 "
                f"ELSE (doc_id // 20) % {N_VARIANTS} END)::VARCHAR")
        else:
            words.append(f"'tmplw{i}'")
    return " || ' ' || ".join(words)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    dst = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1skew")
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
    n, fam = con.execute(
        f"SELECT count(*), sum(CASE WHEN doc_id % 20 = 7 THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{dst}/documents.parquet')").fetchone()
    print(f"[make_sf1_skew] documents: {n} rows, {fam} in the template family")

    con.execute(f"""
        COPY (
          SELECT event_id,
                 CASE WHEN event_id % 10 = 3 THEN 42::BIGINT
                      ELSE user_id END AS user_id,
                 * EXCLUDE (event_id, user_id)
          FROM read_parquet('{src}/events.parquet')
          ORDER BY event_id
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    n, hot = con.execute(
        f"SELECT count(*), sum(CASE WHEN user_id = 42 THEN 1 ELSE 0 END) "
        f"FROM read_parquet('{dst}/events.parquet')").fetchone()
    print(f"[make_sf1_skew] events: {n} rows, {hot} on the hot user")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "embeddings"):
        shutil.copyfile(f"{src}/{t}.parquet", dst / f"{t}.parquet")
        print(f"[make_sf1_skew] {t}: copied verbatim")


if __name__ == "__main__":
    main()
