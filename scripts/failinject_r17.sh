#!/bin/bash
# Failure-injection certification (r16 verdict item 3): the durability
# machinery — reliable loop checkpoints, RocksDB streaming state,
# LoopResume round commits — exists for process loss, and before this
# script none of it had ever seen one. Three legs:
#
#   A) SIGKILL one EXECUTOR JVM mid-loop in q_pagerank_eps under a
#      real multi-JVM master with GRAFT_LOOP_CHECKPOINT=reliable —
#      the relaunched executor must re-read checkpointed blocks from
#      files and the query must complete hash-green.
#   B) SIGKILL one executor mid-drain in a RocksDB-state streaming
#      query (q_stream_media) under the same master — keyed state
#      must reload from the checkpoint into the relaunched executor.
#   C) SIGKILL the DRIVER mid-loop in q_pagerank_eps with a
#      GRAFT_LOOP_RESUME_DIR set, after >= 2 committed rounds; the
#      rerun must RESUME (committed round dir mtime unchanged — a
#      restart-from-0 would recommit it) and land hash-green.
#
# Kill triggers are observable artifacts, not sleeps: leg A/C wait for
# reliable-checkpoint / resume-round files to appear (proof the loop
# is mid-flight), leg B waits for the streaming state checkpoint.
#
# Usage: scripts/failinject_r17.sh [outdir]   (default target/failinject_r17)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-target/failinject_r17}
SF=/root/testdata/sf0.1
mkdir -p "$OUT"
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13

note() { echo "[$(date +%T)] $*" | tee -a "$OUT/log.txt"; }

wait_file() { # pattern timeout_s
  local deadline=$((SECONDS + $2))
  while [ $SECONDS -lt $deadline ]; do
    compgen -G "$1" > /dev/null && return 0
    sleep 0.3
  done
  return 1
}

executor_pids() {
  pgrep -f CoarseGrainedExecutorBackend || true
}

# ---------- Leg A: executor kill, reliable loop checkpoint ----------
leg_a() {
  note "=== LEG A: executor SIGKILL mid q_pagerank_eps (reliable checkpoint, local-cluster)"
  local ckpt=/tmp/fi_ckpt_a out=/tmp/fi_va
  rm -rf "$ckpt" "$out"; mkdir -p "$ckpt"
  SPARK_GRAFT_MASTER='local-cluster[2,4,4096]' SPARK_GRAFT_CPUS=8 \
    GRAFT_LOOP_CHECKPOINT=reliable GRAFT_CHECKPOINT_DIR="$ckpt" \
    scripts/run.sh graft.Verify "$SF" "$out" q_pagerank_eps \
    > "$OUT/a_driver.out" 2>&1 &
  local vpid=$!
  # a checkpointed RDD dir under ckpt == the loop is mid-flight
  if wait_file "$ckpt/*/rdd-*" 180; then
    local victim
    victim=$(executor_pids | head -1)
    if [ -n "$victim" ]; then
      note "leg A: killing executor pid $victim (checkpoint observed)"
      kill -9 "$victim"
    else
      note "leg A: WARN no executor pid found at trigger time"
    fi
  else
    note "leg A: WARN checkpoint never appeared; no kill injected"
  fi
  wait "$vpid"; local rc=$?
  note "leg A: Verify rc=$rc"
  python3 scripts/check.py "$SF" "$out" q_pagerank_eps | tee -a "$OUT/log.txt"
}

# ---------- Leg B: executor kill, RocksDB streaming state ----------
leg_b() {
  note "=== LEG B: executor SIGKILL mid q_stream_media drain (RocksDB state, local-cluster)"
  local out=/tmp/fi_vb
  # stale checkpoint roots would fool the trigger (live runs keep
  # theirs via the owner.pid liveness sweep — none is running here)
  rm -rf "$out" /dev/shm/graft-drain-ckpt*
  SPARK_GRAFT_MASTER='local-cluster[2,4,4096]' SPARK_GRAFT_CPUS=8 \
    GRAFT_STATE_PROVIDER=rocksdb \
    scripts/run.sh graft.Verify "$SF" "$out" q_stream_media \
    > "$OUT/b_driver.out" 2>&1 &
  local vpid=$!
  # the drain's RAM-backed streaming checkpoint lives at
  # <ckptRoot>/<queryName>/ (StreamQueries.drain resolves the query
  # name under the root) and grows state/ once the stateful stage runs
  if wait_file "/dev/shm/graft-drain-ckpt*/*/state/0/*" 240; then
    sleep 1
    local victim
    victim=$(executor_pids | head -1)
    if [ -n "$victim" ]; then
      note "leg B: killing executor pid $victim (streaming state observed)"
      kill -9 "$victim"
    else
      note "leg B: WARN no executor pid found at trigger time"
    fi
  else
    note "leg B: WARN streaming state dir never appeared; no kill injected"
  fi
  wait "$vpid"; local rc=$?
  note "leg B: Verify rc=$rc"
  python3 scripts/check.py "$SF" "$out" q_stream_media | tee -a "$OUT/log.txt"
}

# ---------- Leg C: driver kill mid-loop, LoopResume ----------
leg_c() {
  note "=== LEG C: driver SIGKILL mid q_pagerank_eps loop, then LoopResume rerun"
  local resume=/tmp/fi_resume out1=/tmp/fi_vc1 out2=/tmp/fi_vc2
  rm -rf "$resume" "$out1" "$out2"
  GRAFT_LOOP_RESUME_DIR="$resume" SPARK_GRAFT_CPUS=8 \
    scripts/run.sh graft.Verify "$SF" "$out1" q_pagerank_eps \
    > "$OUT/c_driver1.out" 2>&1 &
  local vpid=$!
  # kill the driver once round_2 has committed (mid-loop by contract)
  if wait_file "$resume/round_2/_meta.json" 180; then
    note "leg C: round_2 committed; SIGKILL driver pid $vpid"
    kill -9 "$vpid"
  else
    note "leg C: WARN round_2 never committed; no kill injected"
  fi
  wait "$vpid" 2>/dev/null
  local rc1=$?
  # 137 = SIGKILL landed mid-run; 0 would mean the loop outran the
  # trigger and the leg proved nothing — say so loudly
  note "leg C: killed run rc=$rc1 (137 expected)"
  local kmax kdir kmtime
  # COMMITTED dirs only: 'round_[0-9]*' also matches an in-flight
  # _tmp_round_N left by the kill, which would inflate kmax and point
  # the mtime probe at a dir with no _meta.json (ADVICE r17)
  kmax=$(ls "$resume" 2>/dev/null | grep -E '^round_[0-9]+$' | grep -o '[0-9]*' | sort -n | tail -1)
  kdir="$resume/round_$kmax"
  if [ -n "$kmax" ] && [ -f "$kdir/_meta.json" ]; then
    kmtime=$(stat -c %Y "$kdir/_meta.json")
  else
    kmtime=""
    note "leg C: WARN — no committed round with _meta.json after kill"
  fi
  note "leg C: after kill, newest committed round = $kmax (meta mtime $kmtime)"
  # rerun with the same resume dir: must CONTINUE, not restart. The
  # end state is identical either way (that is the point), so the
  # discriminator is OBSERVATIONAL: a watcher polls the resume dir and
  # records every round/_tmp_round name that ever appears — a
  # restart-from-0 would recommit round_1/round_2, a resume's first
  # new commit is round_$((kmax+1)).
  : > "$OUT/c_seen.txt"
  ( while :; do ls "$resume" >> "$OUT/c_seen.txt" 2>/dev/null; sleep 0.05; done ) &
  local wpid=$!
  GRAFT_LOOP_RESUME_DIR="$resume" SPARK_GRAFT_CPUS=8 \
    scripts/run.sh graft.Verify "$SF" "$out2" q_pagerank_eps \
    > "$OUT/c_driver2.out" 2>&1
  note "leg C: rerun rc=$?"
  kill "$wpid" 2>/dev/null; wait "$wpid" 2>/dev/null
  # pre-kill survivors (round_kmax-1, round_kmax) legitimately appear
  # in listings — only _tmp_round_N names mark commits the RERUN made
  local seen mincommit
  seen=$(sort -u "$OUT/c_seen.txt" | tr '\n' ' ')
  note "leg C: rounds observed during rerun: $seen"
  mincommit=$(grep -o '_tmp_round_[0-9]*' "$OUT/c_seen.txt" \
    | grep -o '[0-9]*$' | sort -n | head -1)
  if [ -z "$mincommit" ]; then
    note "leg C: WARN — watcher saw no _tmp commit (poll too coarse?)"
  elif [ "$mincommit" -le "$kmax" ]; then
    note "leg C: FAIL — rerun recommitted round_$mincommit <= committed $kmax (restart-from-0)"
  else
    note "leg C: RESUMED — rerun's first commit was round_$mincommit (= committed+1: $kmax+1)"
  fi
  local kmtime2
  if [ -d "$kdir" ] && [ -f "$kdir/_meta.json" ] && [ -n "$kmtime" ]; then
    kmtime2=$(stat -c %Y "$kdir/_meta.json")
    if [ "$kmtime" = "$kmtime2" ]; then
      note "leg C: RESUMED — round_$kmax meta mtime unchanged ($kmtime)"
    else
      note "leg C: FAIL — round_$kmax was recommitted (restart-from-0?)"
    fi
  else
    # commit(n) drops rounds < n-1, so the pre-kill round may have been
    # cleaned up by later rounds — that also proves continuation
    note "leg C: round_$kmax cleaned up by later commits (continuation)"
  fi
  note "leg C: final rounds: $(ls "$resume" 2>/dev/null | tr '\n' ' ')"
  python3 scripts/check.py "$SF" "$out2" q_pagerank_eps | tee -a "$OUT/log.txt"
}

# FI_LEGS selects a subset (e.g. FI_LEGS="b c" to re-drive two legs)
for leg in ${FI_LEGS:-a b c}; do "leg_$leg"; done
note "=== all legs done"
