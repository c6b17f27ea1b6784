#!/bin/bash
# Pre-snapshot regression gate (wired per r10 verdict item 7): compare
# a fresh bench run against the committed 158-query baseline and fail
# on any >2x per-query steady regression (bench_gate.py applies its
# 0.75 s absolute-delta noise floor). Run it before every end-of-round
# snapshot:
#
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_XMX=48g \
#     scripts/run.sh graft.Bench        # writes target/bench.json
#   scripts/round_gate.sh               # gate vs committed baseline
#
# The baseline is min-per-query over a multi-sample campaign (see the
# provenance field inside the JSON); regenerate it the same way after
# intentional performance work, never from a single sample.
# The NEW side may be comma-separated sample paths — bench_gate then
# min-merges them per query first (the same estimator the baseline
# was minted by); single contended samples spike random sub-second
# queries 2-5x on this box. ENFORCED since r15: a within-spread
# excusal on a single new sample exits nonzero asking for a rerun
# with 2+ samples — the spread alone cannot green-light a flag.
# The round close also requires scaling COVERAGE: every catalog query
# must have a committed row or below-floor entry in SCALING.md
# (r11 verdict item 5 — a query added in a round must ship with its
# scaling evidence; measure new queries via scripts/scaling_run.sh).
BASE=${ROUND_GATE_BASELINE:-baselines/bench_sf0.1_171q.json}
NEW=${1:-target/bench.json}
python3 "$(dirname "$0")/count_gate.py" || exit 1
python3 "$(dirname "$0")/scaling_gate.py" || exit 1
# the gate's own spread logic must work before we trust its verdict
python3 "$(dirname "$0")/bench_gate.py" --selftest > /dev/null || exit 1
exec python3 "$(dirname "$0")/bench_gate.py" "$BASE" "$NEW" "${2:-2.0}"
