#!/usr/bin/env python3
"""Assemble BENCH_SKEW.json from the adversarial-skew protocol runs.

Protocol (mirrors BENCH_SF10's subset-vs-control design): the SAME query
subset runs as interleaved solo triples on uniform /tmp/sf1 and on the
skewed /tmp/sf1skew (built by make_sf1_skew.py: one template family at 5%
of docs with one exact text at 2.5% of the corpus; one user with 10% of
events). Per query the citable number is the median of 3; the skew ratio
divides the skew median by the SAME-SESSION uniform median, so the ambient
band and subset inflation cancel.

Usage: bench_skew_protocol.py uni_1.json uni_2.json uni_3.json \
         skew_1.json skew_2.json skew_3.json > BENCH_SKEW.json
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
    paths = sys.argv[1:7]
    assert len(paths) == 6, "need 3 uniform + 3 skew run files"
    uni = [json.load(open(p)) for p in paths[:3]]
    skw = [json.load(open(p)) for p in paths[3:]]
    names = sorted(uni[0]["queries"])
    for r in uni + skw:
        assert sorted(r["queries"]) == names, "query sets differ across runs"
        assert r["failed"] == [], f"run has failures: {r['failed']}"

    uni_med = {q: round(med(uni, q), 3) for q in names}
    skw_med = {q: round(med(skw, q), 3) for q in names}
    ratios = {q: round(skw_med[q] / uni_med[q], 2) for q in names}
    rs = sorted(ratios.values())

    def pct(p):
        return rs[min(len(rs) - 1, int(p * len(rs)))]

    out = {
        "metric": "skew_total",
        "value": round(statistics.median([r["value"] for r in skw]), 3),
        "unit": "sec",
        "protocol": ("median-of-3 interleaved solo subset runs, local[32], "
                     "uniform /tmp/sf1 vs /tmp/sf1skew (make_sf1_skew.py: "
                     "one near-dup template family at 5% of docs incl. ONE "
                     "exact text at 2.5% of the corpus; one user with 10% "
                     "of events); same-session control cancels ambient"),
        "n_queries": len(names),
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
