#!/bin/bash
# Round-19 pin matrix + fourth-decade legs, sequential JVMs:
#  leg 1 (sf0.1): standard Verify + oracle for every round-19-touched
#         registration — e14 (new recall report), e10/e11 (generator
#         default flip; results unchanged by construction, re-proven),
#         c4 (null-ignoring AVG denominator), the standing-fixture
#         consumers (d28/d29/d30 shared index, d31/d32/d39 shared base
#         + preserveInput copy-on-write), e04/e05/e13 (shared IVF
#         centroids).
#  leg 2 (sf1): the same set minus e05 (its monolithic IVF mirror is
#         the known ENOSPC class past sf0.1; e05's own sf1 evidence is
#         the r16 bench window and its spec recall pins).
#  leg 3 (sf30 -> sf60 bench chunk): the capped/guarded family
#         (e08/e10/e11/e12/d39) + anchors, runs=1, one window per SF —
#         the cost curve PAST the cap's firing point (VERDICT item 3).
#  leg 4 (sf60): e08/e12/d40 standard oracle; e10/e11 staged pins
#         (pin_e10_staged.py / pin_e11_staged.py).
set -euo pipefail
cd /root/repo
logdir=benchlogs_r19
mkdir -p "$logdir"

R19Q=e14_lsh_recall_report,e10_semdedup_threshold,e11_semdedup_banded,c4_by_director,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance,d32_frozen_cap_advance,d39_guarded_advance,e04_ann_ivf,e05_neardup_blocked,e13_cluster_sample

echo "== leg 1: sf0.1 standard =="
SPARK_GRAFT_VERIFY_ONLY=$R19Q \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/vout_sf01_r19" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/vout_sf01_r19 2>&1 \
  | tee "$logdir/oracle_sf01_r19.log" | tail -3

# d32 excluded at sf1 BY DESIGN (unchanged from r13): the dup-heavy
# GenScale fixture flips 468 shingle cap statuses, so the frozen-cap
# assertNoCapFlips precondition correctly refuses — the loud failure
# is the operator working as specified, not a pinnable row (NOTES:772)
R19Q1=e14_lsh_recall_report,e10_semdedup_threshold,e11_semdedup_banded,c4_by_director,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance,d39_guarded_advance,e04_ann_ivf,e13_cluster_sample
echo "== leg 2: sf1 standard =="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_ONLY=$R19Q1 \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf1 /tmp/vout_sf1_r19" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r19 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf1 /tmp/vout_sf1_r19 2>&1 \
  | tee "$logdir/oracle_sf1_r19.log" | tail -3

CHUNKQ=d09_rolling_hash,e08_neardup_lsh,e10_semdedup_threshold,e11_semdedup_banded,e12_lsh_cap_report,d39_guarded_advance
echo "== leg 3: sf30 -> sf60 bench chunk =="
for sf in sf30 sf60; do
  SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf \
  SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_ONLY=$CHUNKQ \
  SPARK_GRAFT_BENCH_OUT="$logdir/bench_${sf}_r19.json" \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | tail -1 | sed "s/^/[$sf] /" | tee -a "$logdir/decade_chunk_r19.log"
done

echo "== leg 4a: sf60 standard (e08/e12/d40) =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_ONLY=e08_neardup_lsh,e12_lsh_cap_report,d40_gram_cap_report \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf60 /tmp/vout_sf60_r19" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r19 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf60 /tmp/vout_sf60_r19 2>&1 \
  | tee "$logdir/oracle_sf60_r19.log" | tail -4

echo "== leg 4b: sf60 e10+e11 staged =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_ONLY=e10_semdedup_threshold,e11_semdedup_banded \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf60 /tmp/vout_sf60_e" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
rm -f /tmp/e10pin.duckdb /tmp/e11pin.duckdb
python3 tools/pin_e10_staged.py /root/repo/benchdata/sf60 /tmp/vout_sf60_e 2>&1 \
  | tee "$logdir/pin_e10_sf60.log" | tail -4
python3 tools/pin_e11_staged.py /root/repo/benchdata/sf60 /tmp/vout_sf60_e 2>&1 \
  | tee "$logdir/pin_e11_sf60.log" | tail -4
