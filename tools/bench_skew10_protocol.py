#!/usr/bin/env python3
"""Assemble BENCH_SKEW10.json — adversarial skew composed with the SECOND
scaling decade (round-16 verdict ask #6).

The sf1 skew sweep (BENCH_SKEW.json) proved the df-cap/reps-collapse
defenses absorb a hot fingerprint at 2.5% of a 50k-doc corpus; this one
asks the same question a decade higher: /tmp/sf10skew (make_sf10_skew.py
applies the IDENTICAL family transform to the 500k-doc sf10 corpus, so
the hot exact text is 12,500 copies — 10x the absolute mass). The
near-dup/graph documents-only subset runs as interleaved solo runs,
uniform /tmp/sf10 first (the SAME-SESSION control cancels ambient and
subset inflation); per query the citable number is the median across the
N runs per arm (N = half the files given — the decade costs ~9 min per
run, so N may be smaller than the sf1 sweep's 3).

Usage: bench_skew10_protocol.py uni_1.json [uni_2.json ...] \
         skew_1.json [skew_2.json ...] > BENCH_SKEW10.json
(equal counts per arm, uniform files first)
"""
import json
import statistics
import sys


def med(runs, q):
    vals = [r["queries"][q] for r in runs]
    if any(v < 0 for v in vals):
        return -1.0
    return statistics.median(vals)


def main() -> None:
    paths = sys.argv[1:]
    assert paths and len(paths) % 2 == 0, "need equal uniform + skew run files"
    n = len(paths) // 2
    uni = [json.load(open(p)) for p in paths[:n]]
    skw = [json.load(open(p)) for p in paths[n:]]
    names = sorted(uni[0]["queries"])
    for p, r in zip(paths, uni + skw):
        assert sorted(r["queries"]) == names, f"{p}: query set differs"
        assert r["failed"] == [], f"{p}: run has failures: {r['failed']}"

    uni_med = {q: round(med(uni, q), 3) for q in names}
    skw_med = {q: round(med(skw, q), 3) for q in names}
    ratios = {q: round(skw_med[q] / uni_med[q], 2) for q in names}
    rs = sorted(ratios.values())

    def pct(p):
        return rs[min(len(rs) - 1, int(p * len(rs)))]

    out = {
        "metric": "skew10_total",
        "value": round(statistics.median([r["value"] for r in skw]), 3),
        "unit": "sec",
        "protocol": (f"median-of-{n} interleaved solo subset runs, local[32], "
                     "uniform /tmp/sf10 (500k docs) vs /tmp/sf10skew "
                     "(make_sf10_skew.py: the sf1 skew family transform at "
                     "10x absolute mass — 25k family docs, 12.5k on ONE "
                     "exact text = 2.5% of the corpus); same-session "
                     "uniform control cancels ambient"),
        "n_queries": len(names),
        "runs_per_arm": n,
        "uniform_total": round(statistics.median([r["value"] for r in uni]), 3),
        "uniform_run_totals": [round(r["value"], 3) for r in uni],
        "skew_run_totals": [round(r["value"], 3) for r in skw],
        "uniform_queries": uni_med,
        "skew_queries": skw_med,
        "ratio_skew_vs_uniform": {
            "p10": pct(0.10), "median": pct(0.50), "p90": pct(0.90),
            "max": rs[-1],
            "over_3x": sorted(q for q, v in ratios.items() if v > 3.0),
        },
        "ratios": ratios,
    }
    print(json.dumps(out, indent=1, sort_keys=False))


if __name__ == "__main__":
    main()
