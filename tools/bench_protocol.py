#!/usr/bin/env python3
"""Assemble BENCH_LOCAL.json from a triple of solo full bench runs.

Usage: bench_protocol.py <bench_triple.jsonl> [prev_BENCH_LOCAL.json]

Reads one bench JSON line per run (3 expected), takes per-query medians and
run totals, writes the BENCH_LOCAL.json shape to stdout, and — if the prior
protocol file is given — prints a per-query ratio distribution (median /
p10 / p90 over common queries) so ambient multiplicative bands are
distinguishable from isolated real regressions at a glance.
"""
import json
import statistics
import sys


def main() -> None:
    runs = []
    with open(sys.argv[1]) as f:
        for line in f:
            line = line.strip()
            if line:
                runs.append(json.loads(line))
    if len(runs) < 3:
        sys.exit(f"expected >=3 runs, got {len(runs)}")
    for r in runs:
        if r.get("failed"):
            sys.exit(f"run has failures: {r['failed']}")

    names = sorted(runs[0]["queries"])
    for r in runs[1:]:
        if sorted(r["queries"]) != names:
            sys.exit("runs cover different query sets")

    medians = {q: round(statistics.median(r["queries"][q] for r in runs), 3)
               for q in names}
    totals = [round(r["value"], 3) for r in runs]
    out = {
        "metric": "total",
        "value": round(statistics.median(totals), 3),
        "unit": "sec",
        "protocol": f"median-of-{len(runs)} solo full runs, local[32], sf0.1",
        "run_totals": totals,
        "n_queries": len(names),
        "queries": medians,
    }
    print(json.dumps(out, indent=1))

    if len(sys.argv) > 2:
        prev = json.load(open(sys.argv[2]))["queries"]
        common = [q for q in names if q in prev and prev[q] > 0.05]
        ratios = sorted(medians[q] / prev[q] for q in common)
        n = len(ratios)
        msg = {
            "common_queries": n,
            "ratio_p10": round(ratios[n // 10], 3),
            "ratio_median": round(statistics.median(ratios), 3),
            "ratio_p90": round(ratios[9 * n // 10], 3),
            "new_queries": sorted(set(names) - set(prev)),
            "top_movers": sorted(
                ((q, round(medians[q] / prev[q], 2), prev[q], medians[q])
                 for q in common), key=lambda t: -t[1])[:8],
        }
        print("## vs previous protocol", file=sys.stderr)
        print(json.dumps(msg, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
