#!/bin/bash
# Round-16 bench refresh, all legs SEQUENTIAL in one window (one bench
# JVM at a time — the protocol NOTES pins):
#  1. the heavy pair/index family at sf1 then sf10 (runs=2) — the
#     second-decade growth chunk through the round-16 kernels (carded
#     Jaccard, per-row IVF argmax, pinned pair-shuffle widths);
#  2. the anchored drift-check protocol at sf0.1 (runs=5): the four
#     anchors (d09/d10/d28/d13) plus the two queries the r15 driver
#     window flagged (q30 +10%, e06 +33%) and the streaming sinks —
#     classifies those regressions as window drift vs real.
# d32 is excluded from the heavies by design (its registered query
# asserts the flip-free precondition, which sf1/sf10 mod-64 batches
# violate loudly).
set -euo pipefail
cd /root/repo

HEAVIES=d06_minhash_candidates,d07_jaccard_pairs,d12_corpus_curation,d13_incremental_dedup,d17_winnow_fingerprints,d18_dup_clusters,d21_cluster_curation,e05_neardup_blocked,e08_neardup_lsh,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$HEAVIES \
  SPARK_GRAFT_BENCH_OUT=/tmp/heavies_r16_$sf.json \
    sbt -batch 'runMain graft.Bench' > /tmp/heavies_r16_$sf.log 2>&1
  echo "heavies $sf done"
done

ANCHORED=d09_rolling_hash,d10_bpeish_tokens,d28_pair_index_curation,d13_incremental_dedup,q29_events_stream_sink,q31_sessions_stream_sink,q30_sessionization,e06_knn_int8
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=5 SPARK_GRAFT_BENCH_ONLY=$ANCHORED \
SPARK_GRAFT_BENCH_OUT=/tmp/anchored_r16.json \
  sbt -batch 'runMain graft.Bench' > /tmp/anchored_r16.log 2>&1
echo "anchored done"
echo "R16 BENCH REFRESH DONE"
