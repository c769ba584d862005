#!/bin/bash
# Round-15 sf10 legs, re-run at 818b480 after the GC-pause fix (the
# sf0.01/sf0.1/sf1 legs passed at 9b838ac; the diff between the two
# commits is Verify session configs + chain script only — no query
# logic, no Bench change — so those artifacts remain valid; each
# artifact's _meta.git_head records exactly which commit certified it).
# The sf10 Verify + compare below is ONE unstitched run at HEAD.
set -o pipefail
cd /root/repo
REG=132
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }
mkdir -p /tmp/r15_logs
vlog() { grep '\[verify\]' "$1" || true; tail -1 "$1"; }

step "verify @ sf10 — UNSTITCHED at HEAD (8 cores / 20g, see r15_chain.sh)"
rm -rf /tmp/vout_r15_sf10
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=20g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10 /tmp/vout_r15_sf10" > /tmp/r15_logs/verify_sf10.log 2>&1 || exit 1
vlog /tmp/r15_logs/verify_sf10.log
[ "$(ls /tmp/vout_r15_sf10 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf10"; exit 1; }

step "compare @ sf10 -> CORRECTNESS_SCALE_100X.json"
rm -f CORRECTNESS_SCALE_100X.json
mkdir -p /tmp/duck_spill_r15
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/tmp/duck_spill_r15 \
  python3 tools/check_oracle.py /root/repo/scaledata/sf10 /tmp/vout_r15_sf10 CORRECTNESS_SCALE_100X.json 2>&1 | tail -2 || true
python3 - <<'EOF' || exit 1
import json
d = json.load(open('CORRECTNESS_SCALE_100X.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('sf10 errors:', bad, 'hash fails:', fail)
assert not bad and not fail
EOF

step "bench sf10"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r15_100x.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "BENCH_SCALING.json"
python3 tools/scaling_report.py /tmp/bench_r15_small.json /tmp/bench_r15_big.json 10 /tmp/bench_r15_100x.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "sf10 legs complete"
