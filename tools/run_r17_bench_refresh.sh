#!/bin/bash
# Round-17 bench refresh, all legs SEQUENTIAL in one window (one bench
# JVM at a time — the protocol NOTES pins):
#  1. the heavy pair/index family at sf1 then sf10 (runs=2) — the
#     second-decade growth chunk through the round-17 code, now with
#     the components pairgen/edges_ckpt attribution SPLIT (VERDICT
#     item 1: the former edges_ckpt_ms charged the whole upstream
#     pair-generation pipeline to the checkpoint);
#  2. the round-17 new-operator decade chunk: d35 exact-substring +
#     e10 threshold SemDeDup alongside the no-join anchors;
#  3. the anchored drift-check protocol at sf0.1 (runs=5): the
#     standing anchor set plus the three sub-second queries the r16
#     driver window flagged (m07 +53%, q19 +28%, q17 +27%) —
#     classifies window drift vs real (VERDICT item 4);
#  4. the streaming decade chunk (VERDICT item 5): the two streaming
#     sinks at sf0.1 then sf1 with the no-join anchors, runs=3.
# d32 is excluded from the heavies by design (its registered query
# asserts the flip-free precondition, which sf1/sf10 mod-64 batches
# violate loudly).
set -euo pipefail
cd /root/repo

HEAVIES=d06_minhash_candidates,d07_jaccard_pairs,d12_corpus_curation,d13_incremental_dedup,d17_winnow_fingerprints,d18_dup_clusters,d21_cluster_curation,e05_neardup_blocked,e08_neardup_lsh,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$HEAVIES \
  SPARK_GRAFT_BENCH_OUT=/tmp/heavies_r17_$sf.json \
    sbt -batch 'runMain graft.Bench' > /tmp/heavies_r17_$sf.log 2>&1
  echo "heavies $sf done"
done

NEWOPS=d35_exact_substring,e10_semdedup_threshold,d09_rolling_hash,d10_bpeish_tokens
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$NEWOPS \
  SPARK_GRAFT_BENCH_OUT=/tmp/newops_r17_$sf.json \
    sbt -batch 'runMain graft.Bench' > /tmp/newops_r17_$sf.log 2>&1
  echo "newops $sf done"
done

ANCHORED=d09_rolling_hash,d10_bpeish_tokens,d28_pair_index_curation,d13_incremental_dedup,q29_events_stream_sink,q31_sessions_stream_sink,m07_avi_frame_sample,q19_median_by_status,q17_json_props
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=5 SPARK_GRAFT_BENCH_ONLY=$ANCHORED \
SPARK_GRAFT_BENCH_OUT=/tmp/anchored_r17.json \
  sbt -batch 'runMain graft.Bench' > /tmp/anchored_r17.log 2>&1
echo "anchored done"

STREAMING=q29_events_stream_sink,q31_sessions_stream_sink,d09_rolling_hash,d10_bpeish_tokens
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_ONLY=$STREAMING \
SPARK_GRAFT_BENCH_OUT=/tmp/streaming_r17_sf01.json \
  sbt -batch 'runMain graft.Bench' > /tmp/streaming_r17_sf01.log 2>&1
SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 SPARK_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_RUNS=3 SPARK_GRAFT_BENCH_ONLY=$STREAMING \
SPARK_GRAFT_BENCH_OUT=/tmp/streaming_r17_sf1.json \
  sbt -batch 'runMain graft.Bench' > /tmp/streaming_r17_sf1.log 2>&1
echo "streaming done"
echo "R17 BENCH REFRESH DONE"
