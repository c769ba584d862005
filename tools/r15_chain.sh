#!/bin/bash
# Round-15 artifact chain: STRICTLY SERIAL (never a DuckDB compare
# concurrent with a Verify; never two sbt invocations). Run from
# /root/repo with code FROZEN at the commit being certified.
#
# Round-15 note (closes the r14 ADVICE certification item): the sf10
# Verify + compare below runs UNSTITCHED at HEAD — one chain, one
# commit, no isolated re-runs folded in. If any leg fails, the chain
# stops and the artifact is NOT regenerated from parts.
set -o pipefail
cd /root/repo
REG=132   # registry size; dump dirs must hold REG+1 entries
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }

# Each Verify leg keeps its FULL log under /tmp/r15_logs (the first sf1
# failure this round was undiagnosable because only the tail survived);
# any "[verify]" stderr line (per-query failure or retry) is surfaced.
mkdir -p /tmp/r15_logs
vlog() { grep '\[verify\]' "$1" || true; tail -1 "$1"; }

step "gate: verify + compare @ sf0.01"
rm -rf /tmp/vout_r15_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r15_final" > /tmp/r15_logs/verify_sf001.log 2>&1 || exit 1
vlog /tmp/r15_logs/verify_sf001.log
[ "$(ls /tmp/vout_r15_final | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf0.01"; exit 1; }
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout_r15_final 2>&1 | tail -2 || exit 1

step "EXPLAIN.md regen"
sbt -batch "runMain graft.ExplainAudit /root/testdata/sf0.01 EXPLAIN.md" 2>&1 | tail -1 || exit 1

step "bench sf0.1 (small)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r15_small.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "verify @ sf1"
rm -rf /tmp/vout_r15_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf1 /tmp/vout_r15_sf1" > /tmp/r15_logs/verify_sf1.log 2>&1 || exit 1
vlog /tmp/r15_logs/verify_sf1.log
[ "$(ls /tmp/vout_r15_sf1 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf1"; exit 1; }

step "compare @ sf1 -> CORRECTNESS_SCALE.json"
rm -f CORRECTNESS_SCALE.json   # a crashed compare must FAIL the gate below, not re-certify the stale committed artifact
mkdir -p /tmp/duck_spill_r15
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/tmp/duck_spill_r15 \
  python3 tools/check_oracle.py /root/repo/scaledata/sf1 /tmp/vout_r15_sf1 CORRECTNESS_SCALE.json 2>&1 | tail -2 || true
python3 - <<'EOF' || exit 1
import json
d = json.load(open('CORRECTNESS_SCALE.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('sf1 errors:', bad, 'hash fails:', fail)
assert not bad and not fail
EOF

step "bench sf1 (big)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r15_big.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "disk guard before the sf10 legs (the r11 lesson)"
rm -rf /tmp/vout_r14_sf10 /tmp/vout_r14_sf1 /tmp/vout_r14_final 2>/dev/null
avail=$(df --output=avail -BG / | tail -1 | tr -dc '0-9')
[ "$avail" -ge 25 ] || { echo "under 25G free before sf10 leg"; exit 1; }

step "verify @ sf10 — UNSTITCHED at HEAD"
# 8 cores + 20g for THIS leg only: at the default local[4]/16g the
# exact-knn trio's ~200M-row per-task window sorts spill + GC-storm
# (one observed run lost its executor to 60 missed heartbeats). Results
# are partition-count-independent — every registered query ends in a
# total-order sort and the compare hashes sorted rows. Bench legs keep
# 16g/local[32] (the measured-timing configuration).
rm -rf /tmp/vout_r15_sf10
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=20g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10 /tmp/vout_r15_sf10" > /tmp/r15_logs/verify_sf10.log 2>&1 || exit 1
vlog /tmp/r15_logs/verify_sf10.log
[ "$(ls /tmp/vout_r15_sf10 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf10"; exit 1; }

step "compare @ sf10 -> CORRECTNESS_SCALE_100X.json (~45 min)"
rm -f CORRECTNESS_SCALE_100X.json   # same stale-artifact guard
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

step "bench sf10 (~35 min)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r15_100x.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "BENCH_SCALING.json"
python3 tools/scaling_report.py /tmp/bench_r15_small.json /tmp/bench_r15_big.json 10 /tmp/bench_r15_100x.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "chain complete"
