#!/usr/bin/env python3
"""Build BENCH_SCALING.json from two full Bench dumps (SPARK_GRAFT_BENCH_OUT).

Usage: scaling_report.py bench_sf0.1.json bench_sf1.json [factor] [bench_100x.json]

Emits a JSON artifact with per-query times at both scales and the
wall-time ratio, flagging queries whose ratio exceeds the data factor
(superlinear) and annotating the ones expected to be (both-sides-scaled
similarity queries: work is size(corpus) x size(queries)). The optional
fourth argument is a partial-registry dump at 100x the small scale
(documents/events/embeddings/lineitem dir); queries present in it gain
t_100x / ratio_100x columns so the second decade's exponent is
committed data, not extrapolation."""
import json
import sys

EXPECTED_SUPERLINEAR = {
    # query set = every 50th vector, so corpus AND queries scale with sf:
    # candidate work is |corpus| x |queries| ~ sf^2 by construction. The
    # fixed-query-set scaling story is covered by the KnnScaleBench
    # serving table in RECALL.md (fixed 40-query batch, stored index).
    "sim_knn", "sim_knn_topk", "sim_knn_ivf", "sim_knn_ivf_i8",
    "sim_knn_lsh", "sim_knn_i8",
    # NOTE: dedup_embed is deliberately NOT here anymore — the banded
    # sign-LSH blocking key (round 6) made it ~linear per decade; if it
    # flags superlinear again that is a real regression.
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
    c = json.load(open(sys.argv[4])) if len(sys.argv) > 4 else None
    qa, qb = a["queries"], b["queries"]
    qc = c["queries"] if c else {}
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
        row = {"query": name, "t_small": ta, "t_big": tb,
               "ratio": ratio, "note": note}
        if name in qc and qc[name] >= 0:
            tc = qc[name]
            row["t_100x"] = tc
            # second-decade exponent: 100x/10x ratio on its own decade
            row["ratio_decade2"] = round(tc / tb, 2) if tb >= 0.1 else None
            r2 = row["ratio_decade2"]
            if (r2 is not None and r2 > factor * 1.5
                    and name not in EXPECTED_SUPERLINEAR
                    and name not in EXPECTED_SORT_BOUND):
                row["note"] = (row["note"] + "; " if row["note"] else "") \
                    + "SUPERLINEAR at 100x"
        rows.append(row)
    out = {
        "factor": factor,
        "sf_small": a.get("sf"), "sf_big": b.get("sf"),
        "total_small": a.get("total"), "total_big": b.get("total"),
        "queries": rows,
    }
    if c:
        out["sf_100x"] = c.get("sf")
        out["queries_100x"] = sorted(n for n in qc if n in qa)
    print(json.dumps(out, indent=1))
    flagged = [r for r in rows if "SUPERLINEAR" in r["note"]]
    print(f"\n# {len(rows)} compared, {len(flagged)} unexpectedly superlinear",
          file=sys.stderr)
    for r in flagged:
        print(f"#   {r['query']}: {r['t_small']}s -> {r['t_big']}s "
              f"(x{r['ratio']}) {r.get('t_100x', '')}", file=sys.stderr)


if __name__ == "__main__":
    main()
