#!/usr/bin/env python3
"""Spark-vs-Spark invariance compare of two Verify output dirs.

The execution-invariance gate: the SAME query surface dumped by graft.Verify
under two different execution topologies (local[32] vs local[5], local[32]
vs local-cluster[2,16,m], speculation on vs off, ...) must be HASH-EXACT per
query — same columns, same dtypes, same rendered values after the driver's
canonical column/row sort (logic imported from check_pandas so the three
checkers can't drift). Any divergence is a determinism bug: partition-order
dependence, a non-commutative merge, or serialization-dependent state in an
aggregator.

Usage: python3 tools/compare_verify.py <controlDir> <candidateDir> [query ...]
Exits 1 listing the diverging queries.
"""
import glob
import os
import sys

import pandas as pd

from check_pandas import canon, render


def load(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return None, "no output"
    try:
        return pd.read_parquet(files[0]), None
    except Exception as e:  # noqa: BLE001 — report, don't crash the sweep
        return None, f"parquet read: {str(e).splitlines()[0]}"


def main() -> None:
    ctl_dir, cand_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    names = sorted(d for d in os.listdir(ctl_dir)
                   if os.path.isdir(os.path.join(ctl_dir, d)))
    assert names, f"{ctl_dir}: no query output dirs"
    cand_names = {d for d in os.listdir(cand_dir)
                  if os.path.isdir(os.path.join(cand_dir, d))}
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        if name not in cand_names:
            print(f"FAIL {name}: missing from {cand_dir}")
            n_fail += 1
            continue
        a, aerr = load(ctl_dir, name)
        b, berr = load(cand_dir, name)
        if aerr or berr:
            print(f"FAIL {name}: {aerr or berr}")
            n_fail += 1
            continue
        if sorted(a.columns) != sorted(b.columns):
            print(f"FAIL {name}: cols {sorted(a.columns)} vs {sorted(b.columns)}")
            n_fail += 1
            continue
        ca, ea = canon(a)
        cb, eb = canon(b)
        if ea or eb:
            print(f"FAIL {name}: {ea or eb}")
            n_fail += 1
            continue
        if len(ca) != len(cb):
            print(f"FAIL {name}: rows {len(ca)} vs {len(cb)}")
            n_fail += 1
            continue
        dt_bad = [(c, str(ca[c].dtype), str(cb[c].dtype)) for c in ca.columns
                  if str(ca[c].dtype) != str(cb[c].dtype)]
        ra, rb = render(ca), render(cb)
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(ra, rb)) if x != y]
        if dt_bad or bad:
            msg = []
            if dt_bad:
                msg.append(f"dtypes {dt_bad}")
            if bad:
                i, x, y = bad[0]
                msg.append(f"{len(bad)}/{len(ra)} rows differ; first at {i}: {x} vs {y}")
            print(f"FAIL {name}: " + " | ".join(msg))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ra)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
