#!/usr/bin/env python3
"""Assemble BENCH_SF1.json from N (>=3 recommended) solo full sf1 bench runs.

Round-20 lesson: single sf1 runs on identical code and data spanned
794.5/1013.2/920.0 s (ambient session bands are multiplicative at this
runtime), and the noisy run pushed four per-char queries nominally past the
10x scaling gate while their medians sat at 6.3-8.9x. The sf1 citable number
is therefore the PER-QUERY MEDIAN over the runs, same as the sf0.1 protocol
(BASELINE.md "Measurement protocol").

Usage:
  bench_sf1_protocol.py <run.json> [<run.json> ...] <BENCH_LOCAL.json>

The last argument is the sf0.1 protocol file used for scaling ratios; output
(the BENCH_SF1.json shape) goes to stdout. Runs may cover different query
sets if the surface grew between runs — a query's median is over the runs
that contain it (noted in the protocol string when it happens).
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    runs = [json.load(open(f)) for f in sys.argv[1:-1]]
    prot = json.load(open(sys.argv[-1]))
    for r in runs:
        if r.get("failed"):
            sys.exit(f"run has failures: {r['failed']}")

    allq = sorted(runs[-1]["queries"])
    partial = any(sorted(r["queries"]) != allq for r in runs)
    med = {q: round(statistics.median(
        [r["queries"][q] for r in runs if q in r["queries"]]), 3) for q in allq}

    ratios = {q: round(med[q] / prot["queries"][q], 2)
              for q in allq if prot["queries"].get(q, 0) > 0.05}
    rs = sorted(ratios.values())

    def pct(p: float) -> float:
        return round(rs[min(len(rs) - 1, int(p * len(rs)))], 2)

    note = (" (surfaces differ between runs - a query's median is over the"
            " runs containing it)" if partial else "")
    out = {
        "metric": "total",
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "protocol": (f"median-of-{len(runs)} solo full runs, local[32], sf1 "
                     "(10x key-shifted replica set from tools/make_sf1.py), "
                     f"SPARK_GRAFT_QUERY_TIMEOUT=900{note}"),
        "failed": [],
        "n_queries": len(allq),
        "run_totals": [round(r["value"], 3) for r in runs],
        "sf0_1_protocol_total": prot["value"],
        "ratio_vs_sf0_1_protocol": {
            "p10": pct(.1), "median": pct(.5), "p90": pct(.9),
            "max": round(max(rs), 2),
            "over_10x": [q for q, r in ratios.items() if r > 10],
        },
        "queries": med,
        "ratios_vs_sf0_1": dict(sorted(ratios.items())),
    }
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
