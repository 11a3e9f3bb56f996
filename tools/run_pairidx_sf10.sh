#!/bin/bash
# Round-11 VERDICT item 2 decade evidence: shared-pair-index A/B at sf10
# (recompute suite s1-s4 vs materialize-once + consumers s5-s10), runs=2,
# one window.
set -euo pipefail
log=/root/repo/benchlogs_r11/pairidx_sf10.log
: > "$log"
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf10 \
SPARK_GRAFT_STAGES=pairidx \
SPARK_GRAFT_BENCH_RUNS=2 \
  sbt -batch "runMain graft.BenchStages" 2>/dev/null \
  | grep '"wall"' | sed "s/^/[sf10] /" >> "$log"
cat "$log"
echo PAIRIDX_SF10_COMPLETE
