#!/bin/bash
# sf0.1 -> sf1 scaling certification runner (r10 verdict item 1).
# Runs the expensive-query subset at both scales and prints the
# per-query scaling table via scripts/scaling.py. The sf1 fixture tree
# is ScaleGen output under scratch/sf1 (10x sf0.1 by construction).
#
# Usage: scripts/scaling_run.sh [outdir]   (default target/scaling_r11)
set -e
OUT=${1:-target/scaling_r11}
mkdir -p "$OUT"
SUBSET="q_bloom_prune,q_bm25,q_collocations,q_copurchase,q_curated_corpus,\
q_dedup_clusters,q_dedup_containment,q_dedup_embedding,q_dedup_media,\
q_dedup_minhash,q_dedup_ngram,q_dup_spans,q_except,q_intersect,q_knn_ivf,\
q_ks_drift,q_lang_confusion,q_lang_id,q_media_recall,q_pagerank,\
q_segmentation,q_semdedup,q_skew_join,q_star_join,q_stream_append,\
q_stream_attrib,q_stream_dup_spans,q_stream_join,q_stream_media,\
q_stream_session,q_stream_sliding,q_vocab_growth"

echo "=== sf0.1 subset start $(date +%T) loadavg $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_XMX=48g \
  SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_HIST="$OUT/hist_small.jsonl" \
  SPARK_GRAFT_BENCH_OUT="$OUT/small.json" \
  scripts/run.sh graft.Bench > "$OUT/small.out" 2> "$OUT/small.err"
echo "=== sf1 subset start $(date +%T) loadavg $(cat /proc/loadavg)"
SPARK_GRAFT_SF_DIR=/root/repo/scratch/sf1 SPARK_GRAFT_XMX=96g \
  SPARK_GRAFT_ONLY="$SUBSET" SPARK_GRAFT_HIST="$OUT/hist_big.jsonl" \
  SPARK_GRAFT_BENCH_OUT="$OUT/big.json" \
  scripts/run.sh graft.Bench > "$OUT/big.out" 2> "$OUT/big.err"
echo "=== done $(date +%T) loadavg $(cat /proc/loadavg)"
python3 scripts/scaling.py "$OUT/small.json" "$OUT/big.json" --ratio=10 --floor=0.15 --gate=3.0
