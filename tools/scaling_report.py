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
    "sim_knn_ivf_append", "sim_knn_lsh", "sim_knn_i8",
    # NOTE: dedup_embed is deliberately NOT here anymore — the banded
    # sign-LSH blocking key (round 6) made it ~linear per decade; if it
    # flags superlinear again that is a real regression.
    # 25x25 nation self-pair with per-pair edit distance is constant-size,
    # but the lineitem driver side grows; cross pair family:
    "join_cross",
}

# The note the artifact carries for EXPECTED_SUPERLINEAR rows whose
# measured ratio exceeds the data factor (emitted by the SCRIPT so a
# regeneration can never lose it: the r9 artifact shipped 61x/43x/41x
# decade-2 ratios for the exact-knn trio with empty notes, leaving the
# flagship family's quadratic-by-construction workload unexplained to
# anyone reading the artifact alone).
SUPERLINEAR_NOTE = ("quadratic by workload, not by plan: the query set "
                    "(every 50th vector) scales WITH the corpus, so pair "
                    "work ~ sf^2; the fixed-query-batch serving story and "
                    "the sub-linear scale path (sim_knn_lsh decade-2 ~7x, "
                    "stored-index IVF) are measured in RECALL.md")

# Queries whose sf1 wall is dominated by the mandatory total-order output
# sort (n log n over wide rows). The sort exists ONLY for the oracle's
# deterministic hash-compare contract (SURVEY 7.3) — a production caller
# would not sort — so a ratio mildly above the data factor is the
# n log n term, not a scale defect in the operator itself.
EXPECTED_SORT_BOUND = {"math_funcs", "project_derive", "sort_multi"}

# Structured-Streaming-backed queries (SparkEntry.streamingQueries): wall
# is dominated by per-run FIXED trigger machinery (micro-batch
# scheduling, checkpoint dirs, state-store init), so small-scale ratios
# mostly measure overhead, not the data term — the bench line's
# streaming_sec field carries the same caveat.
STREAMING = {
    "win_tumbling_stream", "win_session_stream", "join_stream_stream",
    "join_stream_static", "topk_stream", "dedup_keys_stream",
    "wx_rain_daily_stream", "wx_rain_daily_stream_restart",
    "join_asof_stream", "dedup_incremental_stream", "sim_knn_ivf_stream",
    "sim_knn_stream",
}
STREAMING_NOTE = ("streaming: fixed trigger/checkpoint overhead dominates "
                  "at bench scale (see streaming_sec in BENCH_r*.json); "
                  "state partitions are sized from staged feed bytes")

# Shape notes for the heaviest PLAIN rows (>10 s at the 100x decade with
# healthy sub-linear/linear ratios): a user sizing a deployment from the
# artifact should see each expensive row's cost model, not a bare number.
SHAPE_NOTES = {
    "dedup_cluster": (
        "iterative connected components over the edge-touched subgraph "
        "only: rounds = near-dup cluster diameter; per-round frames "
        "bounded by 2x|candidate pairs|, not |corpus| (Dedup.scala "
        "nearDupClusters)"),
    "dedup_incremental": (
        "batch JOIN corpus on shared-shingle buckets only: cost follows "
        "|new batch| x matching buckets plus one corpus scan, never "
        "corpus x corpus"),
    "dedup_incremental_stream": (
        "dedup_incremental's streaming spelling: ONE corpus-side index "
        "build (the same single corpus shingling pass, pinned) + "
        "per-micro-batch probes costing |micro-batch shingles| x "
        "matching buckets, + the fixed streaming trigger overhead; "
        "decade ratios track the batch twin's (probe work distributes "
        "over chunks, the index build amortizes across all of them)"),
    "wx_rain_daily_stream_restart": (
        "wx_rain_daily_stream run through a CHECKPOINT RESTART: same "
        "per-decade state/scan work as the non-restart twin plus a "
        "second fixed query-startup + state-store-recovery cost, which "
        "is why it sits ~1-2 s above the twin at every decade (9.99 vs "
        "11.72 at 100x here) — overhead, not data growth"),
    "dedup_minhash": (
        "banded MinHash: shingle -> minhash signature -> band buckets; "
        "candidate pairs come from a bucket equi-join (shuffle on band "
        "key), never all-pairs"),
    "dedup_simhash_verify": (
        "simhash band-blocked candidates + exact Hamming verify: pair "
        "work follows bucket collisions (~linear for non-adversarial "
        "corpora), verify is a codegen'd popcount per candidate"),
    "join_salted": (
        "salt-explode equi-join, result == plain join: fact side gains a "
        "salt column, dim side replicates x16; one shuffle, sub-linear "
        "decades"),
    "ts_gapfill": (
        "one events scan (checkpointed hourly aggregate) + dense "
        "time-grid join + last-observation fill window; decade ratio "
        "tracks the data factor"),
    "wx_wow_record_wire": (
        "per-observation 12-field wire formatting (string building "
        "dominates, one pass, no shuffle beyond the output sort); "
        "~linear by decade"),
    "agg_approx_quantile": (
        "KLL/GK-family sketch per group: map-side partial sketches "
        "merged once; wall tracks rows scanned"),
    "dedup_ngram": (
        "n-gram Jaccard via shared-shingle equi-join with a stop-shingle "
        "guard (top-collision shingles dropped from candidate keys): pair "
        "work follows bucket collisions, never corpus x corpus; integer "
        "Jaccard verify per candidate"),
    "math_funcs": (
        "per-row codegen'd scalar math over the full lineitem width; at "
        "scale the wall is the oracle contract's total-order output sort "
        "(n log n over wide rows), not the operators"),
    "dedup_embed_index_compact": (
        "stored-artifact lifecycle composite: embed-index build on a "
        "third of the corpus + two appends + the layout-only fold + one "
        "probe of the arriving 10% -- build dominates (one banding pass "
        "over the corpus, linear); the fold is O(appended bytes) and the "
        "probe O(batch + matched candidates); fit-once/probe-many "
        "economics, the registered form rebuilds per session by design"),
    "dedup_embed_index_stats": (
        "embed-index build + append + one-row gauge: the gauge itself is "
        "manifest + parquet metadata counts (no vector bytes); wall is "
        "the setup's banding pass, linear by decade"),
    "sql_embed_probe": (
        "pure-SQL probe of the stored embed index (shared dir with "
        "dedup_embed_incremental -- whichever runs first pays the one "
        "banding build): probe cost is |batch bands| x matching buckets "
        "+ cosine verify per candidate, never corpus x corpus"),
    "docs_decontam_bloom": (
        "decontam for the benchmark-too-big-to-broadcast regime: one "
        "corpus scan aggregates per-doc shingle counts + bloom-positive "
        "survivors; only survivors (~fpp x corpus shingles + true hits) "
        "enter the shuffled exact join that removes the false positives; "
        "output bit-identical to docs_decontam (shared oracle)"),
    "sim_knn_ivf_append": (
        "IVF build on 90% of the corpus + ivfAppend of the rest (stored-"
        "codebook native-argmin assignment, additive manifest update) + "
        "partition-pruned probe; same amortized-offline shape as "
        "sim_knn_ivf — the bench row pays build+append once per run and "
        "scales the query set with the corpus, so it carries the "
        "quadratic workload term"),
    "sim_knn_ivf_i8": (
        "IVF build (sampled fit + cell-partitioned write, paid once "
        "offline and amortized) + partition-pruned int8 probe; serving "
        "slope is ~sqrt(n) at fixed query batch — measured in RECALL.md; "
        "the bench row rebuilds the index per run AND scales the query "
        "set with the corpus, so it carries the quadratic workload term"),
    "sim_knn_ivf_stream": (
        "IVF build on 90% + STREAMING ingest of the rest (one ivfAppend "
        "per micro-batch via foreachBatch over the chunked feed) + "
        "partition-pruned probe of the stream-grown index; same "
        "amortized-offline shape as sim_knn_ivf_append with the feed's "
        "fixed staging/trigger overhead on top, and the query set scales "
        "with the corpus (the quadratic workload term)"),
    "sim_knn_ivf": (
        "IVF build (sampled fit + cell-partitioned write, paid once "
        "offline and amortized) + partition-pruned float probe; serving "
        "slope is ~sqrt(n) at fixed query batch (RECALL.md); the bench "
        "row scales the query set with the corpus — quadratic workload "
        "term"),
    "sql_asof_near": (
        "one merge pass (hash-partition + sort per side) tracking both "
        "directional candidates; wall tracks rows sorted, ~n log n by "
        "decade like the other as-of rows"),
    "sql_emb_assign": (
        "one corpus scan x 8-row broadcast codebook + per-vector "
        "row_number keep-best: linear in corpus, shuffle only for the "
        "window partition on vec_id"),
    "sql_lsh_bucket": (
        "one corpus scan through the native LshBuckets expression + "
        "posexplode (tables rows per vector): linear in corpus bytes"),
    "sim_knn": (
        "exact brute-force ranking, quadratic BY WORKLOAD (the query set "
        "is every 50th vector, so queries x corpus grows n^2/50); the "
        "shipped scale paths are sim_knn_ivf/_i8/_lsh (sub-linear probe, "
        "measured crossover at 2e7 in RECALL.md) — this row is the "
        "correctness baseline they are measured against"),
    "sim_knn_topk": (
        "exact ranking through the bounded TopKAggregator buffer (k rows "
        "per partition x query into the shuffle); same quadratic-by-"
        "workload query set as sim_knn, same shipped sub-linear "
        "alternatives"),
    "sim_knn_i8": (
        "exact ranking over int8-quantized codes (4x fewer bytes "
        "scanned); same quadratic-by-workload query set as sim_knn"),
    "join_stream_static": (
        "stream-static equi-join: the static side is re-scanned per "
        "micro-batch (stateless join, Spark semantics), so wall tracks "
        "chunks x static-scan + one pass over the stream side; no state "
        "store growth"),
    "win_session_stream": (
        "streaming session windows with cross-batch merge: per-chunk "
        "state-store read-modify-write over open sessions; wall tracks "
        "chunks x (state partitions + arrived rows), state bounded by "
        "open sessions at the watermark"),
    "text_repetition": (
        "one documents scan computing char-gram repetition ratios per "
        "row (regex + grouped gram counts inside codegen), no shuffle "
        "beyond the output sort; linear in corpus bytes with a heavy "
        "per-row constant"),
    "text_tokens": (
        "one documents scan of per-row tokenizations (whitespace split + "
        "BPE-ish regexp_count), no shuffle beyond the output sort; "
        "linear in corpus bytes with a heavy per-row regex constant"),
}


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
        row = {"query": name, "t_small": ta, "t_big": tb, "ratio": ratio}
        r2 = None
        if name in qc and qc[name] >= 0:
            tc = qc[name]
            row["t_100x"] = tc
            # second-decade exponent: 100x/10x ratio on its own decade
            r2 = round(tc / tb, 2) if tb >= 0.1 else None
            row["ratio_decade2"] = r2
        notes = []
        if name in STREAMING:
            notes.append(STREAMING_NOTE)
        if name in EXPECTED_SUPERLINEAR and (
                (ratio is not None and ratio > factor)
                or (r2 is not None and r2 > factor)):
            notes.append(SUPERLINEAR_NOTE)
        if (name in EXPECTED_SORT_BOUND and ratio is not None
                and factor < ratio <= factor * 1.5):
            notes.append("n log n (oracle's total-order output sort, "
                         "not the operator)")
        if (r2 is not None and name not in STREAMING
                and name not in EXPECTED_SUPERLINEAR
                and factor * 0.7 <= r2 <= factor * 1.5):
            notes.append("~linear (decade-2 ratio ~= data factor)")
        # the alarm notes: unexplained superlinear growth on either decade
        if (ratio is not None and ratio > factor * 1.5
                and name not in EXPECTED_SUPERLINEAR
                and name not in EXPECTED_SORT_BOUND):
            notes.append("SUPERLINEAR")
        if (r2 is not None and r2 > factor * 1.5
                and name not in EXPECTED_SUPERLINEAR
                and name not in EXPECTED_SORT_BOUND):
            notes.append("SUPERLINEAR at 100x")
        # expensive-row shape notes: any row >10 s at the 100x decade
        # must state its cost model in the artifact itself
        if row.get("t_100x") is not None and row["t_100x"] > 10:
            if name in SHAPE_NOTES:
                notes.append(SHAPE_NOTES[name])
            else:
                # unconditional: a generic note ('~linear', the streaming
                # note) is not a COST MODEL, so it must not suppress the
                # mandatory flag for heavy rows
                notes.append("HEAVY-UNANNOTATED: add a shape note to "
                             "SHAPE_NOTES in tools/scaling_report.py")
        row["note"] = "; ".join(notes)
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
