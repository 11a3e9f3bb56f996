#!/bin/bash
# Round-11 VERDICT item 1: d12 current-vs-persisted-survivors A/B at the
# sf10 and sf30 decades, back-to-back in one window, runs=2 per stage
# (the round-10 protocol: no runs=1 sf30 growth claims).
set -euo pipefail
log=/root/repo/benchlogs_r11/d12ckpt.log
: > "$log"
for sf in sf10 sf30; do
  SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf \
  SPARK_GRAFT_STAGES=d12ckpt \
  SPARK_GRAFT_BENCH_RUNS=2 \
    sbt -batch "runMain graft.BenchStages" 2>/dev/null \
    | grep '"wall"' | sed "s/^/[$sf] /" >> "$log"
done
cat "$log"
echo D12CKPT_COMPLETE
