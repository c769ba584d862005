#!/usr/bin/env python3
"""Build BENCH_SCALING.json from two full Bench dumps (SPARK_GRAFT_BENCH_OUT).

Usage: scaling_report.py bench_sf0.1.json bench_sf1.json [factor]

Emits a JSON artifact with per-query times at both scales and the
wall-time ratio, flagging queries whose ratio exceeds the data factor
(superlinear) and annotating the ones expected to be (both-sides-scaled
similarity queries: work is size(corpus) x size(queries))."""
import json
import sys

EXPECTED_SUPERLINEAR = {
    # query set = every 50th vector, so corpus AND queries scale with sf:
    # candidate work is |corpus| x |queries| ~ sf^2 by construction. The
    # fixed-query-set scaling story is covered by the lsh_fixedq row
    # measured separately in SkewBench/README.
    "sim_knn", "sim_knn_topk", "sim_knn_ivf", "sim_knn_lsh", "sim_knn_i8",
    # label-blocked pair join: blocks grow with sf on both sides
    "dedup_embed",
    # 25x25 nation self-pair with per-pair edit distance is constant-size,
    # but the lineitem driver side grows; cross pair family:
    "join_cross",
}

# Queries whose sf1 wall is dominated by the mandatory total-order output
# sort (n log n over wide rows). The sort exists ONLY for the oracle's
# deterministic hash-compare contract (SURVEY 7.3) — a production caller
# would not sort — so a ratio mildly above the data factor is the
# n log n term, not a scale defect in the operator itself.
EXPECTED_SORT_BOUND = {"math_funcs", "project_derive", "sort_multi"}


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(qa):
        if name not in qb:
            continue
        ta, tb = qa[name], qb[name]
        if ta < 0 or tb < 0:
            rows.append({"query": name, "t_small": ta, "t_big": tb,
                         "ratio": None, "note": "FAILED"})
            continue
        # sub-0.1s small-scale timings are overhead-dominated; ratios on
        # them are meaningless (fixed costs mask the data term)
        ratio = round(tb / ta, 2) if ta >= 0.1 else None
        note = ""
        if ratio is not None and ratio > factor:
            if name in EXPECTED_SUPERLINEAR:
                note = "superlinear (expected: both join sides scale)"
            elif name in EXPECTED_SORT_BOUND and ratio <= factor * 1.5:
                note = "n log n (oracle's total-order output sort, not the operator)"
            elif ratio > factor * 1.5:
                note = "SUPERLINEAR"
        rows.append({"query": name, "t_small": ta, "t_big": tb,
                     "ratio": ratio, "note": note})
    out = {
        "factor": factor,
        "sf_small": a.get("sf"), "sf_big": b.get("sf"),
        "total_small": a.get("total"), "total_big": b.get("total"),
        "queries": rows,
    }
    print(json.dumps(out, indent=1))
    flagged = [r for r in rows if r["note"] == "SUPERLINEAR"]
    print(f"\n# {len(rows)} compared, {len(flagged)} unexpectedly superlinear",
          file=sys.stderr)
    for r in flagged:
        print(f"#   {r['query']}: {r['t_small']}s -> {r['t_big']}s "
              f"(x{r['ratio']})", file=sys.stderr)


if __name__ == "__main__":
    main()
