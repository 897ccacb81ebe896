#!/usr/bin/env python3
"""Events tables for the second/third scaling decades (round-27, r26 verdict
task 3): the sf10/sf100 corpora carried documents only, so the steep
events-window scalers (events_sliding, window_session) had never been
measured past sf1. Same replication policy as make_sf1.py's events table —
R replicas with event_id/user_id offset per replica, so users scale with
volume and per-user session/window structure is preserved exactly while
row volume scales linearly.

Usage: python3 tools/make_sf100_events.py  (needs /root/testdata/sf0.1)
Writes /tmp/sf10/events.parquet (100x) and /tmp/sf100/events.parquet (1000x).
"""
import pathlib

import duckdb

SRC = "/root/testdata/sf0.1/events.parquet"


def build(dst_dir: str, reps: int) -> None:
    dst = pathlib.Path(dst_dir)
    dst.mkdir(parents=True, exist_ok=True)
    out = dst / "events.parquet"
    con = duckdb.connect()
    eo, uo = con.execute(
        f"SELECT max(event_id) + 1, max(user_id) + 1 FROM read_parquet('{SRC}')"
    ).fetchone()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range(0, {reps})) AS r")
    con.execute(f"""
        COPY (
          SELECT event_id + r * {eo} AS event_id, ts,
                 user_id + r * {uo} AS user_id, event_type, value, props
          FROM read_parquet('{SRC}'), reps
        ) TO '{out}' (FORMAT PARQUET)""")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"[make_sf100_events] {out}: {n} rows ({reps} replicas)")


if __name__ == "__main__":
    build("/tmp/sf10", 100)
    build("/tmp/sf100", 1000)
