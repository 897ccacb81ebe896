#!/usr/bin/env python3
"""Plan-shape gate: run after `sbt "runMain graft.Explain <sfDir>" > out.txt`
to assert no query gained an unapproved non-equi join or a cartesian
product. Exits 1 listing offenders.

Usage: python3 tools/plan_audit.py /tmp/explain_out.txt
"""
import sys, re

# the only queries allowed a BroadcastNestedLoopJoin: a bounded band-range
# join, the one-row-probe broadcasts, the k-row centroid broadcast
# (ml_kmeans: every vector scores against all k=8 centroids by design),
# the 1x1 combines of two single-row aggregates (agg_sketch_merge: exact
# count x sketch estimate; graph_triangles: degree stats x triangle
# count), and the days x types dimension scaffold (events_grid: both
# sides group-bounded distinct sets — the one place a cross product is
# the intended semantics) (see PLANS.md "Known intentional non-equi plans")
BNLJ_ALLOWED = {"join_range", "sim_topk", "sim_topk_native", "sim_ann_lsh", "sim_ann_ivf",
                "sim_radius", "sim_sq8", "ml_kmeans", "agg_sketch_merge", "graph_triangles",
                "events_grid"}

def main():
    text = open(sys.argv[1]).read()
    sections = re.split(r"===== (\w+) =====", text)
    bad = []
    # sections = [preamble, name1, body1, name2, body2, ...]
    for name, body in zip(sections[1::2], sections[2::2]):
        if "CartesianProduct" in body:
            bad.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in body and name not in BNLJ_ALLOWED:
            bad.append(f"{name}: unapproved BroadcastNestedLoopJoin")
        if "explain failed" in body:
            bad.append(f"{name}: explain failed")
    if bad:
        print("PLAN AUDIT FAILED:")
        for b in bad:
            print(" ", b)
        sys.exit(1)
    n = len(sections) // 2
    print(f"plan audit OK: {n} queries, no cartesian products, BNLJ only in {sorted(BNLJ_ALLOWED)}")

if __name__ == "__main__":
    main()
