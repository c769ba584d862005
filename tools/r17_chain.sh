#!/bin/bash
# Round-17 artifact chain — the long tail after the code commit.
#
# Discipline (r15/r16 lessons, amended r17):
#  - sbt invocations STRICTLY SERIAL (shared target/ + sbt locks).
#  - TIMED legs (benches) run solo on a quiet box AND behind an explicit
#    `drop_caches` — round 16 proved load1/other_jvms certify CPU quiet
#    but are blind to page-cache state, which alone inflated the
#    many-small-file families 2-13x. Bench now records `cached_mb` so
#    the artifact flags itself if this discipline is ever skipped.
#  - CORRECTNESS legs (Verify dumps, DuckDB compares) are allowed to
#    overlap each other: they are untimed, and the box has the RAM; the
#    r15 "strictly serial" rule was about timed artifacts and the
#    one-sbt-at-a-time lock. The sf10 compare therefore starts the
#    moment its dumps exist and runs UNDER the sf1 Verify (saves ~45
#    min of tail wall-clock); quiet() holds the benches until every
#    compare has drained.
#  - DuckDB spill lives under /root/repo/.duckspill (gitignored) — the
#    r15 sf10 compare died to a sweeper removing its /tmp spill dir
#    mid-run; nothing sweeps the repo.
#
# Ordering: the ~2h sf10 Verify is the critical path and starts FIRST;
# the sf10 compare + sf1 Verify overlap next; benches run last behind
# drop_caches; gates + the artifact mv run at the very end (the
# land-watcher commits artifacts as they appear, so a dead session
# cannot lose them — the round-16 failure mode).
set -o pipefail
cd /root/repo
REG=139
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }
mkdir -p /tmp/r17_logs /root/repo/.duckspill

vlog() {
  grep '\[verify\]' "$1" || true
  tail -1 "$1"
  ! grep -q 'EXHAUSTED retries' "$1"
}
quiet() {
  # refuse a timed artifact while another JVM OR a DuckDB compare is
  # alive (check_oracle is a python process — the r16 quiet() gate was
  # blind to it); WAIT for a compare rather than fail the chain
  local n
  while pgrep -f check_oracle.py >/dev/null; do
    echo "waiting for a running DuckDB compare before the timed leg..."
    sleep 60
  done
  n=$(pgrep -c java || true)
  [ "${n:-0}" -le 1 ] || { echo "BOX CONTENDED: $n java processes"; exit 1; }
}
fresh() { sync && echo 3 > /proc/sys/vm/drop_caches; }
# gate <artifact>: no errors besides no_oracle, no hash mismatches
gate() {
  python3 - "$1" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print(sys.argv[1], 'errors:', bad, 'hash fails:', fail)
assert not bad and not fail
EOF
}

step "verify @ sf10 (139q, r17 HEAD) — 8 cores / 20g (the dump posture)"
rm -rf /tmp/vout_r17_sf10
SPARK_GRAFT_CPUS=8 SPARK_DRIVER_MEM=20g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10 /tmp/vout_r17_sf10" > /tmp/r17_logs/verify_sf10.log 2>&1 || exit 1
vlog /tmp/r17_logs/verify_sf10.log || exit 1
[ "$(ls /tmp/vout_r17_sf10 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf10"; exit 1; }
# the r16 weak item: the exact-knn trio must survive attempt 1
if grep -q 'UNABLE_TO_ACQUIRE_MEMORY' /tmp/r17_logs/verify_sf10.log; then
  echo "WARNING: memory retry seen in sf10 verify (r16 weak item NOT cleared)"
fi

step "fork compare @ sf10 (139q) — overlaps the sf1 Verify; land-watcher commits"
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/root/repo/.duckspill \
  nohup python3 tools/check_oracle.py /root/repo/scaledata/sf10 /tmp/vout_r17_sf10 CORRECTNESS_SCALE_100X_r17.json \
  > /tmp/r17_logs/compare_sf10.log 2>&1 &
CMP10=$!

step "verify @ sf1 (139q, r17 HEAD)"
rm -rf /tmp/vout_r17_sf1
SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf1 /tmp/vout_r17_sf1" > /tmp/r17_logs/verify_sf1.log 2>&1 || exit 1
vlog /tmp/r17_logs/verify_sf1.log || exit 1
[ "$(ls /tmp/vout_r17_sf1 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf1"; exit 1; }

step "fork compare @ sf1 (139q)"
rm -f CORRECTNESS_SCALE.json
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/root/repo/.duckspill \
  nohup python3 tools/check_oracle.py /root/repo/scaledata/sf1 /tmp/vout_r17_sf1 CORRECTNESS_SCALE.json \
  > /tmp/r17_logs/compare_sf1.log 2>&1 &
CMP1=$!

step "await compares (quiet() would hold the benches anyway)"
wait $CMP10 $CMP1 || true
gate CORRECTNESS_SCALE.json || exit 1
gate CORRECTNESS_SCALE_100X_r17.json || exit 1
mv CORRECTNESS_SCALE_100X_r17.json CORRECTNESS_SCALE_100X.json

step "bench sf0.1 — quiet box + fresh cache"
quiet; fresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_small.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "bench sf1 — quiet box + fresh cache"
quiet; fresh
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_big.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "bench sf10 — quiet box + fresh cache (first sf10 bench since r14)"
quiet; fresh
SPARK_DRIVER_MEM=20g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r17_100x.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "BENCH_SCALING.json (139-query registry)"
python3 tools/scaling_report.py /tmp/bench_r17_small.json /tmp/bench_r17_big.json 10 /tmp/bench_r17_100x.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "chain complete"
