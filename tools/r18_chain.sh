#!/bin/bash
# Round-18 artifact chain — the scale legs + timed benches after the code
# commits. Inherits the r15-r17 discipline:
#  - sbt/spark-submit JVM legs STRICTLY SERIAL for TIMED artifacts; a
#    quiet() gate refuses a timed leg while any other JVM or a DuckDB
#    compare is alive.
#  - TIMED legs run behind an explicit drop_caches, and (NEW, r17 VERDICT
#    item 9) fresh() now VERIFIES the drop took: if /proc/meminfo Cached
#    still exceeds the threshold the leg is refused — the r17 cached_mb
#    telemetry promoted to a gate. The bench binary itself still only
#    RECORDS (the driver's own run must never be zeroed by a guard).
#  - CORRECTNESS legs (Verify dumps, DuckDB compares) may overlap each
#    other; compares run with spill under the repo (nothing sweeps it).
#  - sf10 posture: 8 cores / 20g for the Verify dump (the known-good r17
#    posture), SPARK_DRIVER_MEM=16g for full-registry sf1/sf10 benches
#    (the verify-skill gotcha: 8g dies mid-registry, 64g regresses GC).
set -o pipefail
cd /root/repo
REG=139
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }
mkdir -p /tmp/r18_logs /root/repo/.duckspill

vlog() {
  grep '\[verify\]' "$1" || true
  tail -1 "$1"
  ! grep -q 'EXHAUSTED retries' "$1"
}
quiet() {
  local n
  while pgrep -f check_oracle.py >/dev/null; do
    echo "waiting for a running DuckDB compare before the timed leg..."
    sleep 60
  done
  n=$(pgrep -c java || true)
  [ "${n:-0}" -le 1 ] || { echo "BOX CONTENDED: $n java processes"; exit 1; }
}
# fresh: drop caches AND verify the fingerprint the bench will record —
# a timed leg on a cache-churned box (the r16 adjudication hole: 2-13x
# inflation of the many-small-file families at load1 1.65 / 0 other
# JVMs) must be refused, not silently produced.
fresh() {
  sync && echo 3 > /proc/sys/vm/drop_caches
  local mb
  mb=$(awk '/^Cached:/{print int($2/1024)}' /proc/meminfo)
  [ "${mb:-0}" -le 4096 ] || {
    echo "CACHE GATE: Cached=${mb} MB after drop_caches (>4096) — timed leg refused"
    exit 1
  }
  echo "cache gate ok: Cached=${mb} MB"
}
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

JAR=target/scala-2.13/metofficespark_2.13-0.1.0.jar
SUBMIT=/opt/spark/bin/spark-submit

step "verify @ sf10 (139q, r18 HEAD) — 8 cores / 20g (the dump posture)"
rm -rf /tmp/vout_r18_sf10
SPARK_GRAFT_CPUS=8 $SUBMIT --class graft.Verify --driver-memory 20g $JAR \
  /root/repo/scaledata/sf10 /tmp/vout_r18_sf10 > /tmp/r18_logs/verify_sf10.log 2>&1 || exit 1
vlog /tmp/r18_logs/verify_sf10.log || exit 1
[ "$(ls /tmp/vout_r18_sf10 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf10"; exit 1; }
if grep -q 'UNABLE_TO_ACQUIRE_MEMORY' /tmp/r18_logs/verify_sf10.log; then
  echo "WARNING: memory retry seen in sf10 verify"
fi

step "fork compare @ sf10 (139q)"
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/root/repo/.duckspill \
  nohup python3 tools/check_oracle.py /root/repo/scaledata/sf10 /tmp/vout_r18_sf10 CORRECTNESS_SCALE_100X_r18.json \
  > /tmp/r18_logs/compare_sf10.log 2>&1 &
CMP10=$!

step "verify @ sf1 (139q, r18 HEAD)"
rm -rf /tmp/vout_r18_sf1
$SUBMIT --class graft.Verify --driver-memory 16g $JAR \
  /root/repo/scaledata/sf1 /tmp/vout_r18_sf1 > /tmp/r18_logs/verify_sf1.log 2>&1 || exit 1
vlog /tmp/r18_logs/verify_sf1.log || exit 1
[ "$(ls /tmp/vout_r18_sf1 | wc -l)" -eq $((REG+1)) ] || { echo "INCOMPLETE DUMP sf1"; exit 1; }

step "fork compare @ sf1 (139q)"
rm -f CORRECTNESS_SCALE.json
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/root/repo/.duckspill \
  nohup python3 tools/check_oracle.py /root/repo/scaledata/sf1 /tmp/vout_r18_sf1 CORRECTNESS_SCALE.json \
  > /tmp/r18_logs/compare_sf1.log 2>&1 &
CMP1=$!

step "await compares"
wait $CMP10 $CMP1 || true
gate CORRECTNESS_SCALE.json || exit 1
gate CORRECTNESS_SCALE_100X_r18.json || exit 1
mv CORRECTNESS_SCALE_100X_r18.json CORRECTNESS_SCALE_100X.json

step "bench sf1 32-core — quiet box + fresh cache (scaling leg A)"
quiet; fresh
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r18_sf1_c32.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "bench sf1 8-core — quiet box + fresh cache (scaling leg B)"
quiet; fresh
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=8 SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r18_sf1_c8.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "bench sf10 — quiet box + fresh cache (first sf10 bench since r14)"
quiet; fresh
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r18_sf10.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "bench sf0.1 — quiet box + fresh cache (anchor point)"
quiet; fresh
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r18_sf01.json \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 || exit 1

step "BENCH_SCALING.json (139-query registry, sf0.1 -> sf1 -> sf10)"
python3 tools/scaling_report.py /tmp/bench_r18_sf01.json /tmp/bench_r18_sf1_c32.json 10 /tmp/bench_r18_sf10.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "chain complete"
