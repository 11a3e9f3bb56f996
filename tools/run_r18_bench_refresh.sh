#!/bin/bash
# Round-18 bench refresh, all legs SEQUENTIAL in one window (one bench
# JVM at a time — the protocol NOTES pins):
#  1. the sf0.1 full-suite refresh through the round-18 code (98
#     queries: +e11/e12/d39/d40/c1-c7) -> BENCH_wall.json;
#  2. the heavy pair/index family at sf1 then sf10 (runs=2), now
#     including d39 (guard-ON advance) beside d31 — these sidecars
#     also regenerate BENCH_sf10.json via the committed
#     assemble_bench_sf10_r18.py (round-17 ADVICE 1: artifact and tool
#     must match);
#  3. the round-18 new-operator decade chunk (e11 banded SemDeDup,
#     e12 cap report, d40 gram-cap report, the c1-c7 canonical
#     registrations) alongside the no-join anchors.
# d32 stays excluded from the heavies by design (its registered query
# asserts the flip-free precondition, which sf1/sf10 mod-64 batches
# violate loudly).
set -euo pipefail
cd /root/repo

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_OUT=BENCH_wall.json \
  sbt -batch 'runMain graft.Bench' > /tmp/bench_sf01_r18.log 2>&1
echo "sf0.1 full suite done"

HEAVIES=d06_minhash_candidates,d07_jaccard_pairs,d12_corpus_curation,d13_incremental_dedup,d17_winnow_fingerprints,d18_dup_clusters,d21_cluster_curation,e05_neardup_blocked,e08_neardup_lsh,d28_pair_index_curation,d29_pair_index_clusters,d30_incremental_from_index,d31_pair_index_advance,d39_guarded_advance
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$HEAVIES \
  SPARK_GRAFT_BENCH_OUT=/tmp/heavies_r18_$sf.json \
    sbt -batch 'runMain graft.Bench' > /tmp/heavies_r18_$sf.log 2>&1
  echo "heavies $sf done"
done

NEWOPS=e11_semdedup_banded,e12_lsh_cap_report,d40_gram_cap_report,c1_top_rated,c2_movies_by_genre,c3_most_rated,c4_by_director,c5_by_user,c6_null_audit,c7_rating_histogram,d09_rolling_hash,d10_bpeish_tokens,e10_semdedup_threshold
for sf in sf1 sf10; do
  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_BENCH_RUNS=2 SPARK_GRAFT_BENCH_ONLY=$NEWOPS \
  SPARK_GRAFT_BENCH_OUT=/tmp/newops_r18_$sf.json \
    sbt -batch 'runMain graft.Bench' > /tmp/newops_r18_$sf.log 2>&1
  echo "newops $sf done"
done

python3 tools/assemble_bench_sf10_r18.py \
  "round-18 heavies refresh: one window, runs=2, sequential JVMs; includes d39 guard-ON advance" \
  BENCH_sf10.json /tmp/heavies_r18_sf1.json /tmp/heavies_r18_sf10.json
echo "R18 BENCH REFRESH DONE"
