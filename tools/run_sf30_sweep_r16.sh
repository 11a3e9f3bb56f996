#!/bin/bash
# Round-16 sf30 correctness re-pin — the standing r15
# 8/8 pins predated the round-16 carded-kernel change
# (carded Jaccard scoring, pinned pair-shuffle widths). Re-runs
# the full sf30 pair family through the current code:
#   leg 1: the seven linear-mirror queries in one Verify + oracle_check;
#   leg 2: d21 via the staged DuckDB mirror (the monolithic mirror
#          ENOSPCs at ~74 GB scratch — tools/pin_d21_sf30.py runs the
#          same verbatim SQL fragments as four staged connections).
set -euo pipefail
cd /root/repo
logdir=benchlogs_r16
mkdir -p "$logdir"

echo "== leg 1: 7-query sf30 Verify + oracle =="
out=/tmp/vout_sf30_r16
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_VERIFY_ONLY=d06_minhash_candidates,d07_jaccard_pairs,d08_simhash,d13_incremental_dedup,d17_winnow_fingerprints,d27_paragraph_dedup,e08_neardup_lsh \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf30 $out" 2>&1 \
  | grep -E "\[verify\]|success|error\] Total" | tail -4
python3 tools/oracle_check.py /root/repo/benchdata/sf30 "$out" 2>&1 \
  | tee "$logdir/oracle_sf30_7q.log" | tail -3

echo "== leg 2: d21 staged pin =="
bash tools/run_d21_sf30_pin.sh 2>&1 | tee "$logdir/oracle_sf30_d21.log" | tail -3
echo "SF30 SWEEP DONE"
