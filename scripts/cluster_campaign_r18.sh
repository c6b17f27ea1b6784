#!/bin/bash
# Multi-JVM bench campaign (r17 verdict item 2): N full-catalog bench
# samples under the same local-cluster master, aggregated into a
# cluster profile with PER-QUERY MIN + SPREAD — the r17 profile was a
# single sample (n=1) and its one outlier call (q_dedup_recall) rested
# on it. Samples append to target/bench_cluster.jsonl (never the
# committed local[32] history); the aggregate lands in baselines/.
#
# Usage: scripts/cluster_campaign_r18.sh [n_samples] [master]
set -u
cd "$(dirname "$0")/.."
N=${1:-3}
MASTER=${2:-local-cluster[2,8,12288]}
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
OUT=target/cluster_campaign_r18
mkdir -p "$OUT"

for i in $(seq 1 "$N"); do
  echo "[$(date +%T)] cluster bench sample $i/$N under $MASTER"
  SPARK_GRAFT_MASTER="$MASTER" SPARK_GRAFT_CPUS=8 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_XMX=8g \
    SPARK_GRAFT_STEADY_RUNS=2 \
    SPARK_GRAFT_BENCH_OUT="$OUT/sample_$i.json" \
    scripts/run.sh graft.Bench > "$OUT/sample_$i.out" 2> "$OUT/sample_$i.err"
  echo "[$(date +%T)] sample $i rc=$?"
done

python3 - "$OUT" "$N" "$MASTER" <<'EOF'
import json, sys, statistics
out, n, master = sys.argv[1], int(sys.argv[2]), sys.argv[3]
samples = []
for i in range(1, n + 1):
    try:
        samples.append(json.load(open(f"{out}/sample_{i}.json")))
    except Exception as e:
        print(f"sample {i} unreadable: {e}")
if not samples:
    sys.exit("no samples")
queries = sorted(samples[0]["steady"].keys())
agg = {}
for q in queries:
    vals = [s["steady"][q] for s in samples if q in s.get("steady", {})]
    agg[q] = {
        "min": min(vals),
        "max": max(vals),
        "spread_pct": round(100.0 * (max(vals) - min(vals)) / min(vals), 1),
        "samples": [round(v, 3) for v in vals],
    }
profile = {
    "master": master,
    "sf": "/root/testdata/sf0.1",
    "n_samples": len(samples),
    "steady_runs_per_sample": samples[0].get("steady_runs"),
    "composite_min_per_query": round(sum(v["min"] for v in agg.values()), 2),
    "loadavg_per_sample": [s.get("loadavg") for s in samples],
    "steal_pct_per_sample": [s.get("steal_pct") for s in samples],
    "queries": agg,
}
dest = "baselines/bench_sf0.1_171q_cluster_r18.json"
json.dump(profile, open(dest, "w"), indent=1, sort_keys=True)
print(f"wrote {dest}: composite(min-per-query) = {profile['composite_min_per_query']} s over {len(samples)} samples")
# headline comparison vs the committed local[32] mint
mint = json.load(open("baselines/bench_sf0.1_171q.json"))["steady"]
worst = sorted(((agg[q]["min"] / mint[q], q) for q in queries if q in mint), reverse=True)[:8]
print("worst cluster/local-mint ratios (min-sample):")
for r, q in worst:
    print(f"  {q:28s} {r:5.2f}x  cluster={agg[q]['min']:.2f}s local={mint[q]:.3f}s spread={agg[q]['spread_pct']}%")
EOF
