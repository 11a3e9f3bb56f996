#!/bin/bash
# Round-15 evidence rungs, run sequentially in ONE window (one bench
# JVM at a time; the sandbox wall clock drifts across windows):
#  1. direct frozen advance rung at sf1 mod-64 (AdvanceRung, runs=2) —
#     post-broadcast-probe bar vs r14's advrung_sf1_frozen_repart.log.
#  2. direct frozen advance rung at sf30 mod-64 (runs=2) — VERDICT
#     item 5's target: warm advance under ~15 s (r14: 23.5 s warm).
#  3. compaction rung at sf1 (CompactRung): consumer wall before/after
#     compactDocIndex after 5 chained frozen advances (VERDICT item 2).
#  4. anchored drift-check set GROWN to d28+d13 (VERDICT item 4):
#     runs=5, one window, alongside d09/d10/q29/q31.
set -euo pipefail
cd /root/repo
logdir=benchlogs_r15
mkdir -p "$logdir"

echo "== rung 1: direct frozen advance sf1 mod64 (runs=2) =="
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 \
SPARK_GRAFT_ADV_MOD=64 SPARK_GRAFT_BENCH_RUNS=2 \
  sbt -batch "runMain graft.tools.AdvanceRung" 2>/dev/null \
  | grep -E 'advrung|"metric"' > "$logdir/advrung_sf1_frozen_r15.log"
tail -2 "$logdir/advrung_sf1_frozen_r15.log"

echo "== rung 2: direct frozen advance sf30 mod64 (runs=2) =="
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf30 \
SPARK_GRAFT_ADV_MOD=64 SPARK_GRAFT_BENCH_RUNS=2 \
  sbt -batch "runMain graft.tools.AdvanceRung" 2>/dev/null \
  | grep -E 'advrung|"metric"' > "$logdir/advrung_sf30_frozen_r15.log"
tail -2 "$logdir/advrung_sf30_frozen_r15.log"

echo "== rung 3: compaction rung sf1 (5 advances, consumer runs=3) =="
SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 \
SPARK_GRAFT_ADV_MOD=64 SPARK_GRAFT_COMPACT_ADVANCES=5 \
SPARK_GRAFT_BENCH_RUNS=3 \
  sbt -batch "runMain graft.tools.CompactRung" 2>/dev/null \
  | grep -E 'compact|"metric"' > "$logdir/compact_rung_sf1.log"
tail -2 "$logdir/compact_rung_sf1.log"

echo "== rung 4: anchored set + d28 + d13 (runs=5, one window) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=5 \
SPARK_GRAFT_BENCH_OUT="$logdir/anchored_r15_wall.json" \
SPARK_GRAFT_BENCH_ONLY=d09_rolling_hash,d10_bpeish_tokens,q29_events_stream_sink,q31_sessions_stream_sink,d28_pair_index_curation,d13_incremental_dedup \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"queries"' > "$logdir/anchored_r15.log"
cat "$logdir/anchored_r15.log"
echo "R15 RUNGS DONE"
