#!/bin/bash
# Round-18 correctness pin matrix for the new/changed operators,
# sequential legs (one JVM at a time):
#   leg 1 (sf1): standard Verify + oracle_check for every round-18
#          registration (e11/e12/d39/d40/c1-c7) plus the byte-mirror
#          multimodal trio (m03/m04/m05) and the capped e08/e10 (cap
#          fires nowhere <= sf10, so the pins prove no-regression);
#   leg 2 (sf10): the cheap-mirror subset (e12/d40/c1-c7/m03/m04/m05
#          + capped e08); e10/e11's monolithic mirrors are the ENOSPC
#          class past sf1 — e11 gets its own staged pin below;
#   leg 3 (sf10): e11 Verify + staged pin (pin_e11_staged.py);
#   leg 4 (sf30): e08/e12/d40 standard + e10/e11 staged — e08's sf30
#          result CHANGES this round (max own-bucket occupancy 900 >
#          cap 512), which is exactly the bound the cap exists to
#          enforce; the re-pin replaces the r16 row.
set -euo pipefail
cd /root/repo
logdir=benchlogs_r18
mkdir -p "$logdir"

NEWQ=e11_semdedup_banded,e12_lsh_cap_report,d39_guarded_advance,d40_gram_cap_report,c1_top_rated,c2_movies_by_genre,c3_most_rated,c4_by_director,c5_by_user,c6_null_audit,c7_rating_histogram,m03_resize_meta,m04_frame_sample,m05_wav_meta,e08_neardup_lsh,e10_semdedup_threshold

echo "== leg 1: sf1 standard =="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_ONLY=$NEWQ \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf1 /tmp/vout_sf1_r18" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r18 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf1 /tmp/vout_sf1_r18 2>&1 \
  | tee "$logdir/oracle_sf1_r18.log" | tail -3

CHEAP10=e12_lsh_cap_report,d40_gram_cap_report,c1_top_rated,c2_movies_by_genre,c3_most_rated,c4_by_director,c5_by_user,c6_null_audit,c7_rating_histogram,m03_resize_meta,m04_frame_sample,m05_wav_meta,e08_neardup_lsh
echo "== leg 2: sf10 cheap mirrors =="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_ONLY=$CHEAP10 \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf10 /tmp/vout_sf10_r18" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r18 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf10 /tmp/vout_sf10_r18 2>&1 \
  | tee "$logdir/oracle_sf10_r18.log" | tail -3

echo "== leg 3: sf10 e11 staged =="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_VERIFY_ONLY=e11_semdedup_banded \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf10 /tmp/vout_sf10_e11" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
python3 tools/pin_e11_staged.py /root/repo/benchdata/sf10 /tmp/vout_sf10_e11 2>&1 \
  | tee "$logdir/pin_e11_sf10.log" | tail -4

echo "== leg 4a: sf30 standard (e08/e12/d40) =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_ONLY=e08_neardup_lsh,e12_lsh_cap_report,d40_gram_cap_report \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf30 /tmp/vout_sf30_r18" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
ORACLE_MEMORY_LIMIT=40GB ORACLE_THREADS=16 ORACLE_TEMP_DIRECTORY=/tmp/duck_r18 \
  python3 tools/oracle_check.py /root/repo/benchdata/sf30 /tmp/vout_sf30_r18 2>&1 \
  | tee "$logdir/oracle_sf30_r18.log" | tail -4

echo "== leg 4b: sf30 e10+e11 staged =="
SPARK_DRIVER_MEM=64g SPARK_GRAFT_VERIFY_ONLY=e10_semdedup_threshold,e11_semdedup_banded \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf30 /tmp/vout_sf30_e" 2>&1 \
  | grep -E "\[verify\]|success" | tail -3
rm -f /tmp/e10pin.duckdb /tmp/e11pin.duckdb
python3 tools/pin_e10_staged.py /root/repo/benchdata/sf30 /tmp/vout_sf30_e 2>&1 \
  | tee "$logdir/pin_e10_sf30_r18.log" | tail -4
python3 tools/pin_e11_staged.py /root/repo/benchdata/sf30 /tmp/vout_sf30_e 2>&1 \
  | tee "$logdir/pin_e11_sf30.log" | tail -4
echo "R18 PINS DONE"
