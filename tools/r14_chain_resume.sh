#!/bin/bash
# Round-14 chain RESUME: the full-registry sf10 Verify dumped 129/130
# (dedup_ngram failed in-session, passed in an isolated re-run at the
# same commit and was stitched into the dump dir); this script runs the
# remaining serial stages: sf10 compare, sf10 bench, scaling report.
set -o pipefail
cd /root/repo
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }

[ "$(ls /tmp/vout_r14_sf10 | wc -l)" -eq 130 ] || { echo "INCOMPLETE DUMP sf10"; exit 1; }

step "compare @ sf10 -> CORRECTNESS_SCALE_100X.json (~78 min)"
rm -f CORRECTNESS_SCALE_100X.json
mkdir -p /tmp/duck_spill_r14
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/tmp/duck_spill_r14 \
  python3 tools/check_oracle.py /root/repo/scaledata/sf10 /tmp/vout_r14_sf10 CORRECTNESS_SCALE_100X.json 2>&1 | tail -2 || true
python3 - <<'PYEOF' || exit 1
import json
d = json.load(open('CORRECTNESS_SCALE_100X.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('sf10 errors:', bad, 'hash fails:', fail)
assert not bad and not fail
PYEOF

step "bench sf10 (~30 min)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_100x.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "BENCH_SCALING.json"
python3 tools/scaling_report.py /tmp/bench_r14_small.json /tmp/bench_r14_big.json 10 /tmp/bench_r14_100x.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "resume complete"
