#!/bin/bash
# Round-16 landing watcher: the sf10 DuckDB compare (the round's #1
# deliverable) can outlive the builder's attention window, so the
# moment CORRECTNESS_SCALE_100X.json appears this script (a) gate-checks
# it, (b) commits the artifact while HEAD's src/ still equals the code
# state that produced the dumps (the _meta.git_head honesty invariant),
# and (c) commits the round-16 source work immediately after. Inert if
# the artifact already landed and was committed by hand.
set -u
cd /root/repo
for i in $(seq 1 1200); do
  [ -f CORRECTNESS_SCALE_100X.json ] && break
  sleep 20
done
[ -f CORRECTNESS_SCALE_100X.json ] || exit 1
# the compare writes the file once, at the very end — but give the
# writer a beat anyway
sleep 10
git ls-files --error-unmatch CORRECTNESS_SCALE_100X.json >/dev/null 2>&1 \
  && git diff --quiet HEAD -- CORRECTNESS_SCALE_100X.json && exit 0

python3 - > /tmp/r16_gate.txt 2>&1 <<'EOF'
import json
d = json.load(open('CORRECTNESS_SCALE_100X.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('meta:', d['_meta'])
print('errors:', bad, 'hash fails:', fail)
assert not bad and not fail, 'sf10 gate failed'
EOF
gate=$?
cat /tmp/r16_gate.txt

git add CORRECTNESS_SCALE_100X.json
if [ $gate -eq 0 ]; then
  git commit -m "Land the 132-query sf10 certification at the r15 code state

One unstitched chain: the 2h11m full-registry Verify
(SPARK_GRAFT_CPUS=8, 20g — all 133 dumps, sim_knn recovered on its
bounded retry) plus one clean serial DuckDB compare on an otherwise
idle box. _meta.git_head points at a commit whose src/ tree is
identical to the r15 round head that built the dump binary (the
intervening commits are docs/tooling only); 114/114 oracled queries
hash-match at the 100x decade, 18 no-oracle-by-contract.

Closes the r15 verdict's top item. The four round-16 queries are not
in this artifact by design (they postdate the dump binary); they are
certified at sf0.01/sf0.1 in-round and join the next sf10 pass."
else
  git commit -m "sf10 compare artifact (GATE FAILED - see _meta and failing rows)

Committed as-is for auditability; do not treat as a certification."
fi

# round-16 source work: tests green (127/127, 15 suites), full-registry
# sf0.01 Verify + DuckDB compare 117/117, new-query oracles also green
# at sf0.001/sf0.01/sf0.1
git add -A
git commit -m "IVF hot-cell refit, CAS'd manifest commits, stored embed near-dup index, SQL near-dup probe, knn sort-width fix, bench self-certification

Round-16 operator work (SURVEY 2B-ext now 136 ids, 117 oracled):

- Similarity.ivfRefit (registered sim_knn_ivf_refit): split cells past
  capFactor x the mean live load via LOCAL 2-means on each hot cell's
  own rows - O(hot cells) scan-fraction recovery where the only prior
  remedy was the O(corpus) rebuild. Pre-refit roots exclude the split
  cells through the manifest refits read rule (partition-column NOT-IN,
  pruning intact); rows/fingerprint are untouched so ivfValid still
  gates at the built nlist; compact accounts relocated base rows via
  refitRows. SimilaritySpec pins row-multiset preservation, planted
  recall == exact through refit AND the post-refit fold, concentration
  drop, and the no-op-below-cap contract.
- Every IVF manifest mutation now commits through a CAS sequencer
  (_commits/m<mseq+1>, CREATE_NEW, token = the mutation's deterministic
  id): of two racing appends exactly one wins and the loser throws with
  its staged data intact - the silent lost-delta that used to cost an
  O(corpus) rebuild is unreachable. Own-token retries re-publish
  idempotently; legacy manifests seed mseq from the append count.
- Stored embedding near-dup index (Dedup.embedDupIndexWrite/Load/
  IfAbsent/Append + probeEmbedDups; registered dedup_embed_incremental
  + streaming twin, both DuckDB-oracled via a generated plane-literal
  twin with bits FROZEN on the corpus count): banded sign-LSH buckets
  as a bucketed-by-(bk, blockCols) external table - all of the
  candidate join's keys, since Spark 3.3 co-partitioning requires every
  cluster key - plus corpus vectors and an additive manifest with the
  replay pair. Continuous-ingest semantic dedup at O(batch) per
  restart.
- sql_neardup_probe: the stored near-dup index probed in pure SQL text
  (injected shingle_hash + the catalog-registered bucketed shingle
  table + parquet.\`hot/sizes\` reads), sharing dedup_incremental's
  oracle - closes the dedup family's last Scala-only surface.
- Similarity.knn: size-derived ranking-window width (repartition on
  q_id replacing the window's own exchange, ~1M pair rows per sort
  task) - removes the sf10 Verify's one UNABLE_TO_ACQUIRE_MEMORY spot.
- Bench records load1 + other-JVM count in its JSON line and warns on a
  contended box; Verify removes a twice-failed query's partial dump so
  the chain's count gate genuinely fires; IvfAppendBench gains a refit
  mode (shift regime, concentration/recall/wall before vs after vs the
  rebuild ceiling); replay-feed publishes via delete-then-ATOMIC_MOVE
  (portable rename semantics)."
exit 0
