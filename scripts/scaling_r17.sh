#!/bin/bash
# Round-17 factor-scale campaign: the embedding family re-minted on
# the salted-signMask fixtures (the r17 "sgn:" salt changed every
# copy>=1 embedding, superseding baselines/scaling_r16), plus the
# first factor-scale readings for the new 1/16-rate audits — the
# measured "cost ~ rate x full sweep" contract at two decades.
#
# Fixture generation (r17, salted mask):
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf1 10
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf10 100
#
# Usage: scripts/scaling_r17.sh [outdir]   (default target/scaling_r17)
set -e
cd "$(dirname "$0")/.."
OUT=${1:-target/scaling_r17}
mkdir -p "$OUT"
SUBSET="q_dedup_embedding,q_media_recall,q_media_recall_sampled,\
q_media_recall_lowrate,q_emb_recall,q_emb_recall_sampled,\
q_emb_recall_lowrate"

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
