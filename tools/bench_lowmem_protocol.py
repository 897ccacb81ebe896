#!/usr/bin/env python3
"""Assemble BENCH_LOWMEM.json from the constrained-heap protocol runs.

The memory-pressure axis of the scale evidence: the SAME heavy-query
subset runs at sf1 as interleaved solo triples under the protocol heap
(SPARK_DRIVER_MEM=8g on local[32]: 250 MB heap per concurrent task slot)
and under a half-per-slot constrained heap (4g/32: 125 MB per slot, an
eighth of a typical production executor's 1 GB/core). The measured
boundary below the constrained arm is recorded in BASELINE.md: 62 MB
per slot (2g/32) OOMs in the wedge-expansion stage regardless of a 4x
shuffle-partition raise, while the same 2g heap at 8 slots (250 MB per
slot) completes — heap per CONCURRENT slot, not total heap and not
partition count, is the invariant the heaviest kernels need.
Per query the citable number is the median of 3; the
lowmem ratio divides the constrained median by the SAME-SESSION control
median so the ambient band and subset inflation cancel. Runs carry
SPARK_GRAFT_SPILL=1, so the constrained runs' evidence is not just
"completed": the per-query memory/disk spill bytes show WHERE the
pressure went (graceful spill, not OOM, is the claim under test).

Usage: bench_lowmem_protocol.py c8_1.json c8_2.json c8_3.json \
         c4_1.json c4_2.json c4_3.json > BENCH_LOWMEM.json
"""
import json
import statistics
import sys


def med(runs, q):
    vals = [r["queries"][q] for r in runs]
    if any(v < 0 for v in vals):
        return -1.0
    return statistics.median(vals)


def med_spill(runs, q, idx):
    return int(statistics.median(
        [r["spill_bytes"][q][idx] for r in runs]))


def main() -> None:
    paths = sys.argv[1:7]
    assert len(paths) == 6, "need 3 control(8g) + 3 constrained(4g) run files"
    ctl = [json.load(open(p)) for p in paths[:3]]
    low = [json.load(open(p)) for p in paths[3:]]
    names = sorted(ctl[0]["queries"])
    for p, r in zip(paths, ctl + low):
        assert sorted(r["queries"]) == names, "query sets differ across runs"
        assert r["failed"] == [], f"run has failures: {r['failed']}"
        # graceful spill IS the claim under test: a run accidentally done
        # without SPARK_GRAFT_SPILL=1 must fail here, not silently assemble
        # a zero-spill artifact that asserts the opposite of the evidence
        assert "spill_bytes" in r, f"{p}: no spill_bytes — rerun with SPARK_GRAFT_SPILL=1"
        missing = [q for q in names if q not in r["spill_bytes"]]
        assert not missing, f"{p}: spill_bytes missing queries {missing[:5]}"

    ctl_med = {q: round(med(ctl, q), 3) for q in names}
    low_med = {q: round(med(low, q), 3) for q in names}
    ratios = {q: round(low_med[q] / ctl_med[q], 2) for q in names}
    rs = sorted(ratios.values())
    spill_low = {q: [med_spill(low, q, 0), med_spill(low, q, 1)] for q in names}
    spill_ctl = {q: [med_spill(ctl, q, 0), med_spill(ctl, q, 1)] for q in names}

    def pct(p):
        return rs[min(len(rs) - 1, int(p * len(rs)))]

    out = {
        "metric": "lowmem_total",
        "value": round(statistics.median([r["value"] for r in low]), 3),
        "unit": "sec",
        "protocol": ("median-of-3 interleaved solo subset runs at sf1, "
                     "local[32], SPARK_DRIVER_MEM=8g control (250 MB "
                     "heap/slot) vs 4g constrained (125 MB/slot), "
                     "SPARK_GRAFT_SPILL=1 on all runs; same-session "
                     "control cancels ambient; 62 MB/slot OOM boundary "
                     "probed separately"),
        "n_queries": len(names),
        "control_total": round(statistics.median([r["value"] for r in ctl]), 3),
        "control_run_totals": [round(r["value"], 3) for r in ctl],
        "lowmem_run_totals": [round(r["value"], 3) for r in low],
        "control_queries": ctl_med,
        "lowmem_queries": low_med,
        "ratio_lowmem_vs_control": {
            "p10": pct(0.10), "median": pct(0.50), "p90": pct(0.90),
            "max": rs[-1],
            "over_3x": sorted(q for q, v in ratios.items() if v > 3.0),
        },
        "ratios": ratios,
        "spill_bytes_lowmem": spill_low,
        "spill_bytes_control": spill_ctl,
        "spill_total_gb_lowmem": round(sum(
            m + d for m, d in spill_low.values()) / 2**30, 2),
        "spill_total_gb_control": round(sum(
            m + d for m, d in spill_ctl.values()) / 2**30, 2),
    }
    print(json.dumps(out, indent=1, sort_keys=False))


if __name__ == "__main__":
    main()
