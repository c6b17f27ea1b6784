#!/bin/bash
# sf1 -> sf10 second-decade certification for the candidate-pair
# dedup family and the end-to-end curation pipeline (r14 verdict
# item 1): q_dedup_ngram's only scaling datapoint was first-decade
# alpha 1.02 ("linear by construction"), so the claim that candidate
# count grows linearly at a fixed threshold gets a measured second
# decade here — the decade where an N^2 candidate term would finally
# dominate. q_media_recall is the deliberate O(corpus) anchor sweep
# (alpha ~1 expected BY DESIGN — constant anchor budget x corpus);
# q_bm25 carries the posting-list join; q_curated_corpus is the
# composition users actually run end-to-end.
#
# Fixture generation (one-time, already done in r13):
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf1 10
#   scripts/run.sh graft.ScaleGen /root/testdata/sf0.1 scratch/sf10 100
#
# Usage: scripts/scaling_r15.sh [outdir]   (default target/scaling_r15)
set -e
OUT=${1:-target/scaling_r15}
mkdir -p "$OUT"
SUBSET="q_bm25,q_curated_corpus,q_dedup_containment,q_dedup_ngram,\
q_media_recall"

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
