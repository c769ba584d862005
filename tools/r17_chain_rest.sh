#!/bin/bash
# Remainder of the round-17 chain after the builder reordered it in
# flight: the original r17_chain.sh's wait loop sat idle while the sf1
# compare could already overlap the long 132q sf10 compare (compares are
# untimed and may overlap per the chain discipline). This script picks
# up at the bench legs: wait out every running DuckDB compare, take the
# three fresh-cache benches, refresh BENCH_SCALING, then run the 136q
# sf10 compare over the already-dumped /tmp/vout_r17_sf10. The sf1
# compare was started separately (tools/check_oracle.py ... sf1) and its
# artifact is committed by the land-watcher.
set -o pipefail
cd /root/repo
step() { echo "=== $(date +%H:%M:%S) $1 ==="; }
quiet() {
  local n
  while pgrep -f check_oracle.py >/dev/null; do
    echo "waiting for a running DuckDB compare before the timed leg..."
    sleep 60
  done
  n=$(pgrep -c java || true)
  [ "${n:-0}" -le 1 ] || { echo "BOX CONTENDED: $n java processes"; exit 1; }
}
fresh() { sync && echo 3 > /proc/sys/vm/drop_caches; }

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

step "BENCH_SCALING.json (136-query registry)"
python3 tools/scaling_report.py /tmp/bench_r17_small.json /tmp/bench_r17_big.json 10 /tmp/bench_r17_100x.json > BENCH_SCALING.json || exit 1
grep -c "HEAVY-UNANNOTATED" BENCH_SCALING.json || true

step "compare @ sf10 -> CORRECTNESS_SCALE_100X.json (136q @ r17 HEAD — supersedes the 132q r15-state artifact)"
GRAFT_DUCKDB_MEMLIMIT=24GB GRAFT_DUCKDB_TEMPDIR=/root/repo/.duckspill \
  python3 tools/check_oracle.py /root/repo/scaledata/sf10 /tmp/vout_r17_sf10 CORRECTNESS_SCALE_100X_r17.json 2>&1 | tail -2 || true
python3 - <<'EOF' || exit 1
import json
d = json.load(open('CORRECTNESS_SCALE_100X_r17.json'))
bad = [k for k, v in d.items() if not k.startswith('_') and v.get('err') not in (None, 'no_oracle')]
fail = [k for k, v in d.items() if not k.startswith('_') and v.get('hash_match') is False]
print('sf10 errors:', bad, 'hash fails:', fail)
assert not bad and not fail
EOF
mv CORRECTNESS_SCALE_100X_r17.json CORRECTNESS_SCALE_100X.json

step "chain complete"
