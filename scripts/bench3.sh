#!/bin/bash
# min-of-3 quiet-window bench: 3 full graft.Bench samples at sf0.1.
set -e
OUT=/root/repo/target/bench_r8
for i in 1 2 3; do
  echo "=== sample $i start $(date) loadavg $(cat /proc/loadavg)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_XMX=48g \
    /root/repo/scripts/run.sh graft.Bench > "$OUT/sample$i.out" 2> "$OUT/sample$i.err" || echo "sample $i FAILED"
  grep -o '{"metric".*' "$OUT/sample$i.out" | tail -1 > "$OUT/sample$i.json" || true
  echo "=== sample $i end $(date) loadavg $(cat /proc/loadavg)"
done
