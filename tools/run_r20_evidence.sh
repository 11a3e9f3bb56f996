#!/bin/bash
set -x
cd /root/repo
L=benchlogs_r20

# 1. final full-suite bench at sf0.1, 32 cores (before/after evidence)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=$L/bench_final.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r20_final.log 2>&1

# 2. after-plans
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt -batch "runMain graft.Explain" > /tmp/explain_r20_after.log 2>&1
python3 tools/split_plans.py /tmp/explain_r20_after.log plans/r20 after

# 3. sf1 oracle pins for the round-20 touched set (d32 excluded on
#    benchdata by design: GenScale dup density flips caps -> the
#    frozen assertNoCapFlips precondition refuses, documented r13)
R20Q1=d31_pair_index_advance,d39_guarded_advance,d35_exact_substring,d36_contamination_sweep,d37_decontaminate,d40_gram_cap_report,d42_contamination_split,d25_contamination_matrix,q33_stream_dedup,q29_events_stream_sink,q31_sessions_stream_sink
SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_ONLY=$R20Q1 \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf1 /tmp/vout_sf1_r20" > /tmp/verify_sf1_r20.log 2>&1
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r20 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf1 /tmp/vout_sf1_r20 > $L/oracle_sf1_r20.log 2>&1

# 4. sf10 parallel-scaling axis (VERDICT item 4): heavy family at 32 vs 8
if [ ! -d benchdata/sf10 ]; then
  SPARK_DRIVER_MEM=32g sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 /root/repo/benchdata/sf10 100 10" > /tmp/genscale_sf10.log 2>&1
fi
HEAVY=d31_pair_index_advance,d39_guarded_advance,d07_jaccard_pairs,d12_corpus_curation,e11_semdedup_banded
for C in 32 8; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf10 SPARK_GRAFT_CPUS=$C \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_ONLY=$HEAVY \
  SPARK_GRAFT_BENCH_OUT=$L/bench_sf10_c$C.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf10_c$C.log 2>&1
done

# 5+6. decade bench chunks (clean rerun of sf30 per VERDICT item 3;
#      + d31/q33 added; d36/d40 pin the rewritten sweep kernels)
CHUNKQ=d09_rolling_hash,d31_pair_index_advance,d39_guarded_advance,e08_neardup_lsh,e10_semdedup_threshold,e11_semdedup_banded,e12_lsh_cap_report,q33_stream_dedup,d36_contamination_sweep,d40_gram_cap_report
for sf in sf30 sf60; do
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/benchdata/$sf \
  SPARK_GRAFT_BENCH_RUNS=1 SPARK_GRAFT_BENCH_ONLY=$CHUNKQ \
  SPARK_GRAFT_BENCH_OUT=$L/bench_${sf}_r20.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_${sf}_r20.log 2>&1
done

# 7. sf60 oracle pins (rewritten d40 kernel at scale + anchors)
SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_ONLY=e08_neardup_lsh,e12_lsh_cap_report,d40_gram_cap_report \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf60 /tmp/vout_sf60_r20" > /tmp/verify_sf60_r20.log 2>&1
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r20 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf60 /tmp/vout_sf60_r20 > $L/oracle_sf60_r20.log 2>&1

# 8. full test suite, final insurance
sbt -batch test > /tmp/sbt_test_r20_final.log 2>&1
echo "EXIT_TESTS=$?"
echo DONE_EVIDENCE
