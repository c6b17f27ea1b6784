#!/bin/bash
# Interleaved config A/B on a query subset. Usage: ab_r19.sh <outdir> <rounds>
set -e
cd /root/repo
OUT=$1; ROUNDS=${2:-2}
mkdir -p "$OUT"
SUB="q_approx_distinct,q_approx_quantile,q_asof_nearest,q_bloom_prune,q_bm25,q_boilerplate,q_bpe_encode,q_bpe_merges,q_bpe_pairs,q_cdc_merge,q_centroids,q_collocations,q_components,q_concurrency,q_copurchase,q_curated_corpus,q_dedup_containment,q_dedup_edit,q_dedup_embedding,q_dedup_events,q_dedup_media,q_dedup_media_incremental,q_dedup_ngram,q_dedup_recall,q_except,q_full_outer,q_funnel,q_gapfill,q_global_rank,q_heavy_hitters,q_hybrid_rank,q_incremental,q_intersect,q_ks_drift,q_lang_confusion,q_lang_id,q_late_events,q_media_recall,q_media_recall_lowrate,q_media_recall_sampled,q_ngram_novelty,q_overlap_matrix,q_pack_masks,q_pagerank,q_pagerank_directed,q_pagerank_eps,q_quality_gate,q_quota,q_retention,q_segmentation,q_semi_join,q_session_window,q_skew_join,q_sliding_window,q_spike,q_sql_revenue,q_star_join,q_stream_append,q_stream_attrib,q_stream_budget,q_stream_cdc,q_stream_cms,q_stream_dedup_exact,q_stream_dedup_wm,q_stream_dup_spans,q_stream_emb,q_stream_enrich,q_stream_gate,q_stream_join,q_stream_media,q_stream_near,q_stream_session,q_stream_sliding,q_stream_totals,q_stream_tumbling,q_target_select,q_tfidf,q_transitions,q_triangles,q_triplets,q_tumbling_window,q_vocab_growth"
declare -A OPTS
OPTS[base]=""
OPTS[pfirst]="-Dspark.sql.adaptive.coalescePartitions.parallelismFirst=false"
OPTS[shj]="-Dspark.sql.join.preferSortMergeJoin=false -Dspark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=67108864"
for r in $(seq 1 "$ROUNDS"); do
  for v in base pfirst shj; do
    echo "== round $r variant $v $(date +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg)"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_ONLY="$SUB" \
    SPARK_GRAFT_STEADY_RUNS=2 \
    SPARK_GRAFT_JAVA_OPTS="${OPTS[$v]}" \
    SPARK_GRAFT_BENCH_OUT="$OUT/${v}_r${r}.json" \
    SPARK_GRAFT_HIST="$OUT/hist.jsonl" \
    scripts/run.sh graft.Bench > "$OUT/${v}_r${r}.log" 2>&1 || echo "FAILED $v r$r"
  done
done
echo DONE
