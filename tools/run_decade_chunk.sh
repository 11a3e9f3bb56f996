#!/bin/bash
# Run one decade-bench chunk: the named queries at sf1 then sf10,
# back-to-back in one window (the sandbox wall clock drifts across
# windows — growth ratios are only comparable within a chunk log).
# Usage: run_decade_chunk.sh <chunk-name> <comma-separated-queries>
set -euo pipefail
name=$1
queries=$2
logdir=/root/repo/benchlogs_r8
mkdir -p "$logdir"
log="$logdir/$name.log"
: > "$log"
for sf in sf1 sf10; do
  SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf \
  SPARK_GRAFT_BENCH_ONLY=$queries \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"queries"' | sed "s/^/[$sf] /" >> "$log"
done
cat "$log"
