#!/bin/bash
# Round-14 evidence rungs, run sequentially in ONE tmux window (the
# sandbox wall clock drifts across windows; one bench JVM at a time):
#  1. forced-delta exact advance at sf1 mod-64 (VERDICT item 8): the
#     audited delta path's own cost with the economy guard disabled —
#     rungs a1 / a2x / a3.
#  2. anchored q29/q31 drift check (VERDICT item 6): both streaming
#     sinks + the no-join anchors d09/d10, runs=5, one window, so a
#     driver-window swing on the sinks is attributable.
#  3. clean sf30 frozen rung (VERDICT item 5): runs=2 — BenchStages'
#     median-of-2 picks the LOWER run, absorbing the JVM cold start
#     that contaminated r13's a1 (a2f - a1 went negative).
set -euo pipefail
cd /root/repo
logdir=benchlogs_r14
mkdir -p "$logdir"

echo "== rung 1: forced-delta sf1 mod64 =="
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 \
SPARK_GRAFT_STAGES=advidx SPARK_GRAFT_ADV_MOD=64 \
SPARK_GRAFT_STAGE_FILTER=a1_materialize_corpus80,a2x_materialize80_advance20_forced,a3_materialize_full \
SPARK_GRAFT_BENCH_RUNS=2 \
  sbt -batch "runMain graft.BenchStages" 2>/dev/null \
  | grep -o '{"metric".*' > "$logdir/advidx_sf1_mod64_forced.log"
tail -c 400 "$logdir/advidx_sf1_mod64_forced.log"; echo

echo "== rung 2: anchored q29/q31 (runs=5, one window) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=5 \
SPARK_GRAFT_BENCH_ONLY=d09_rolling_hash,d10_bpeish_tokens,q29_events_stream_sink,q31_sessions_stream_sink \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"queries"' > "$logdir/anchored_q29q31.log"
cat "$logdir/anchored_q29q31.log"

echo "== rung 3: clean sf30 frozen (runs=2) =="
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf30 \
SPARK_GRAFT_STAGES=advidx SPARK_GRAFT_ADV_MOD=64 \
SPARK_GRAFT_STAGE_FILTER=a1_materialize_corpus80,a2f_materialize80_frozen20,a3_materialize_full \
SPARK_GRAFT_BENCH_RUNS=2 \
  sbt -batch "runMain graft.BenchStages" 2>/dev/null \
  | grep -o '{"metric".*' > "$logdir/advidx_sf30_mod64_frozen_clean.log"
tail -c 400 "$logdir/advidx_sf30_mod64_frozen_clean.log"; echo
echo "R14 RUNGS DONE"
