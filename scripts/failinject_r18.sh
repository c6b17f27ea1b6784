#!/bin/bash
# Failure-injection leg D (r17 verdict item 6): DRIVER loss mid
# STREAMING drain with a durable checkpoint resume — the one cell the
# r17 matrix (executor×batch-loop, executor×RocksDB, driver×batch-loop)
# left uncovered.
#
#   D) q_stream_cms drains the staged documents fixture one file per
#      micro-batch (GRAFT_DRAIN_MAX_FILES=1; the sf0.1 staged split is
#      2 part files -> 2 batches) against a DURABLE checkpoint
#      (GRAFT_DRAIN_DURABLE_DIR). The driver is SIGKILLed
#      the moment batch 0's commit lands (streaming state provably
#      exists, later batches provably pending). The rerun must RESUME
#      from the checkpoint — commits/0's mtime unchanged (a
#      restart-from-0 rewrites it), new commit ids strictly extending
#      the pre-kill watermark — and the drained output must hash-match
#      the DuckDB oracle. That last check is the strong one: the
#      resumed run never re-reads the committed batches' files, so a
#      green hash proves their contribution was recovered from the
#      STATE STORE across the driver loss.
#
# Query choice: the leg needs a multi-batch drain whose output is
# batch-split-invariant, or the oracle can't adjudicate the resume.
# q_stream_cms (complete-mode additive cells) is exactly that;
# q_stream_media's first-anchor keyed state picks batch-DEPENDENT
# anchors by design (StreamingOps.bandAnchorState), so it cannot be
# oracle-compared under a file split — it stays covered by leg B
# (executor loss mid RocksDB drain), which kills inside one batch.
#
# Kill trigger is an observable artifact (the commit log entry), not a
# sleep. Usage: scripts/failinject_r18.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-target/failinject_r18}
SF=/root/testdata/sf0.1
mkdir -p "$OUT"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

note() { echo "[$(date +%T)] $*" | tee -a "$OUT/log.txt"; }

wait_file() { # pattern timeout_s
  local deadline=$((SECONDS + $2))
  while [ $SECONDS -lt $deadline ]; do
    compgen -G "$1" > /dev/null && return 0
    sleep 0.2
  done
  return 1
}

leg_d() {
  note "=== LEG D: driver SIGKILL mid q_stream_cms drain (durable checkpoint resume)"
  local dur=/tmp/fi_d_durable out1=/tmp/fi_d_v1 out2=/tmp/fi_d_v2
  rm -rf "$dur" "$out1" "$out2"; mkdir -p "$dur"
  local commits="$dur/ckpt_q_stream_cms/commits"

  GRAFT_DRAIN_DURABLE_DIR="$dur" GRAFT_DRAIN_MAX_FILES=1 SPARK_GRAFT_CPUS=8 \
    scripts/run.sh graft.Verify "$SF" "$out1" q_stream_cms \
    > "$OUT/d_driver1.out" 2>&1 &
  local vpid=$!
  # batch 0's commit-log entry == state committed, later batches pending
  if wait_file "$commits/0" 180; then
    note "leg D: commits/0 landed; SIGKILL driver pid $vpid"
    kill -9 "$vpid"
  else
    note "leg D: WARN commits/0 never appeared; no kill injected"
  fi
  wait "$vpid" 2>/dev/null
  local rc1=$?
  note "leg D: killed run rc=$rc1 (137 expected)"

  # pre-kill watermark: committed batch ids + commits/0 identity
  local kmax c0mtime
  kmax=$(ls "$commits" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -z "$kmax" ]; then
    note "leg D: FAIL — no committed batch survived the kill"
    return 1
  fi
  c0mtime=$(stat -c %Y "$commits/0")
  note "leg D: after kill, committed batches 0..$kmax (commits/0 mtime $c0mtime)"
  if [ "$kmax" -ge 1 ]; then
    note "leg D: WARN — all batches committed before the kill landed; resume window missed (inconclusive, re-run the leg)"
  fi

  # rerun with the same durable checkpoint: must RESUME and complete
  GRAFT_DRAIN_DURABLE_DIR="$dur" GRAFT_DRAIN_MAX_FILES=1 SPARK_GRAFT_CPUS=8 \
    scripts/run.sh graft.Verify "$SF" "$out2" q_stream_cms \
    > "$OUT/d_driver2.out" 2>&1
  note "leg D: rerun rc=$?"

  # resume evidence 1: commits/0 untouched (restart-from-0 rewrites it)
  local c0mtime2 kmax2
  c0mtime2=$(stat -c %Y "$commits/0" 2>/dev/null)
  if [ "$c0mtime" = "$c0mtime2" ]; then
    note "leg D: RESUMED — commits/0 mtime unchanged ($c0mtime)"
  else
    note "leg D: FAIL — commits/0 was rewritten (restart-from-0?)"
  fi
  # resume evidence 2: the commit watermark strictly extended
  kmax2=$(ls "$commits" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "$kmax2" ] && [ "$kmax2" -gt "$kmax" ]; then
    note "leg D: RESUMED — commits extended $kmax -> $kmax2"
  else
    note "leg D: WARN — no new commits in rerun (kill after final batch?)"
  fi
  # the strong check: drained output hash-matches the oracle even
  # though the rerun never re-read batches 0..$kmax's files
  python3 scripts/check.py "$SF" "$out2" q_stream_cms | tee -a "$OUT/log.txt"
}

leg_d
note "leg D artifacts in $OUT"
