#!/bin/bash
# Round-16 artifact chain: STRICTLY SERIAL (never a DuckDB compare
# concurrent with a Verify; never two sbt invocations; never a bench
# with another JVM alive — the r15 lesson, now also self-certified by
# Bench's load1/other_jvms fields). Run from /root/repo with code
# FROZEN at the commit being certified.
#
# Round-16 note: the sf10 100× certification landed EARLY this round at
# the r15 code state (132 queries, CORRECTNESS_SCALE_100X.json — its
# _meta records the exact corpus/HEAD). The 4 round-16 queries are
# certified at sf0.01 + sf1 by THIS chain; the next sf10 pass picks
# them up. This file is the recipe.
set -o pipefail
cd /root/repo
REG=136   # registry size; dump dirs must hold REG+1 entries
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }

mkdir -p /tmp/r16_logs
# Surface any per-query failure/retry; FAIL the chain on exhausted
# retries (the ADVICE r15 medium: a twice-failed no-oracle query now
# also loses its partial dump — Verify rmTree — so the count gate
# fires; this grep makes the failure loud even before counting).
vlog() {
  grep '\[verify\]' "$1" || true
  tail -1 "$1"
  ! grep -q 'EXHAUSTED retries' "$1"
}
quiet() {  # refuse to take a timed artifact on a contended box
  local n
  n=$(pgrep -c java || true)
  [ "${n:-0}" -le 1 ] || { echo "BOX CONTENDED: $n java processes"; exit 1; }
}

step "gate: verify + compare @ sf0.01"
rm -rf /tmp/vout_r16_final
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout_r16_final" > /tmp/r16_logs/verify_sf001.log 2>&1 || exit 1
vlog /tmp/r16_logs/verify_sf001.log || exit 1
[ "$(ls /tmp/vout_r16_final | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf0.01"; exit 1; }
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout_r16_final 2>&1 | tail -2 || exit 1

step "EXPLAIN.md regen"
sbt -batch "runMain graft.ExplainAudit /root/testdata/sf0.01 EXPLAIN.md" 2>&1 | tail -1 || exit 1

step "bench sf0.1 (small) — quiet box required"
quiet
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_small.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "verify @ sf1"
rm -rf /tmp/vout_r16_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf1 /tmp/vout_r16_sf1" > /tmp/r16_logs/verify_sf1.log 2>&1 || exit 1
vlog /tmp/r16_logs/verify_sf1.log || exit 1
[ "$(ls /tmp/vout_r16_sf1 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf1"; exit 1; }

step "compare @ sf1 -> CORRECTNESS_SCALE.json"
rm -f CORRECTNESS_SCALE.json   # a crashed compare must FAIL the gate, not re-certify the stale artifact
mkdir -p /tmp/duck_spill_r16
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/tmp/duck_spill_r16 \
  python3 tools/check_oracle.py /root/repo/scaledata/sf1 /tmp/vout_r16_sf1 CORRECTNESS_SCALE.json 2>&1 | tail -2 || true
python3 - <<'EOF' || exit 1
import json
d = json.load(open('CORRECTNESS_SCALE.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('sf1 errors:', bad, 'hash fails:', fail)
assert not bad and not fail
EOF

step "bench sf1 (big) — quiet box required"
quiet
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_big.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "chain complete — sf10 legs are a separate pass (tools/r15_sf10_legs.sh shape, REG updated) when wall-clock allows"
