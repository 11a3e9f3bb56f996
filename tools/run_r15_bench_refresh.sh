#!/bin/bash
# Round-15 bench refresh, all legs SEQUENTIAL in one window (one bench
# JVM at a time — the protocol NOTES pins):
#  1. full 80-query suite at sf1 (runs=3 medians);
#  2. full suite at sf0.1 in the SAME window (growth denominators);
#  3. the heavy pair/index family at sf1 then sf10 (runs=2) — the
#     second-decade growth chunk for the current code.
# d32's registered query asserts the flip-free precondition and fails
# LOUDLY by design at sf1/sf10 (mod-64 batches flip; see BENCH_sf1
# note) — expected -1 in those legs.
set -euo pipefail
cd /root/repo

SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 SPARK_DRIVER_MEM=24g \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_r15b.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf1_r15b.log 2>&1
echo "sf1 full done"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf01_r15b.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_r15b.log 2>&1
echo "sf0.1 full done"

HEAVIES=d06_minhash_candidates,d07_jaccard_pairs,d12_corpus_curation,d13_incremental_dedup,d17_winnow_fingerprints,d18_dup_clusters,d21_cluster_curation,e05_neardup_blocked,e08_neardup_lsh,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$HEAVIES \
    sbt -batch 'runMain graft.Bench' 2>/dev/null \
    | grep '"queries"' | sed "s/^/[$sf] /" >> /tmp/heavies_decade_r15.log
  echo "heavies $sf done"
done
echo "R15 BENCH REFRESH DONE"
