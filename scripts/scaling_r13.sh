#!/bin/bash
# sf1 -> sf10 scaling certification for the scale-critical subset
# (r12 verdict item 2): the iterative / bucketed paths whose costs
# carry log-diameter, LSH-occupancy, or orientation-bound terms that
# a single x10 step (sf0.1 -> sf1) can't expose. Runs the subset at
# sf0.1, sf1 (scratch/sf1) and sf10 (scratch/sf10) and prints both
# decade tables via scripts/scaling.py.
#
# Fixture generation (one-time):
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf1 10
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf10 100
#
# Usage: scripts/scaling_r13.sh [outdir]   (default target/scaling_r13)
set -e
OUT=${1:-target/scaling_r13}
mkdir -p "$OUT"
SUBSET="q_components,q_copurchase,q_dedup_embedding,q_dup_spans,\
q_pagerank,q_pagerank_directed,q_pagerank_eps,q_stream_append,\
q_stream_dup_spans,q_stream_media,q_triangles"

leg() { # name sfdir xmx
  echo "=== $1 subset start $(date +%T) loadavg $(cat /proc/loadavg)"
  SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_XMX="$3" \
    SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_HIST="$OUT/hist_$1.jsonl" \
    SPARK_GRAFT_BENCH_OUT="$OUT/$1.json" \
    scripts/run.sh graft.Bench > "$OUT/$1.out" 2> "$OUT/$1.err"
}
leg small /root/testdata/sf0.1 48g
leg big   /root/repo/scratch/sf1 96g
leg huge  /root/repo/scratch/sf10 96g
echo "=== done $(date +%T) loadavg $(cat /proc/loadavg)"
echo "--- sf0.1 -> sf1"
python3 scripts/scaling.py "$OUT/small.json" "$OUT/big.json" --ratio=10 --floor=0.15 --gate=3.0
echo "--- sf1 -> sf10"
python3 scripts/scaling.py "$OUT/big.json" "$OUT/huge.json" --ratio=10 --floor=0.15 --gate=3.0
