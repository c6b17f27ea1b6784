#!/bin/bash
# Interleaved code-change A/B for r20: base snapshot vs current classes.
set -e
cd /root/repo
OUT=$1; ROUNDS=${2:-3}; SUB=$3; BASE=${4:-/root/repo/target/classes_r20_base}
mkdir -p "$OUT"
for r in $(seq 1 "$ROUNDS"); do
  for v in old new; do
    CLS=""
    [ "$v" = old ] && CLS="$BASE"
    echo "== round $r $v $(date +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_ONLY="$SUB" \
    SPARK_GRAFT_STEADY_RUNS=3 \
    SPARK_GRAFT_CLASSES="$CLS" \
    SPARK_GRAFT_BENCH_OUT="$OUT/${v}_r${r}.json" \
    SPARK_GRAFT_HIST="$OUT/hist.jsonl" \
    scripts/run.sh graft.Bench > "$OUT/${v}_r${r}.log" 2>&1 || echo "FAILED $v r$r"
  done
done
echo DONE
