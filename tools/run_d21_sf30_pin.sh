#!/bin/bash
# Round-11 VERDICT item 4: pin d21 (cluster curation, LM-cost mirror) at
# sf30 = 1.5M docs. Verify materializes the shared micro-nat cost table
# from the sf30 corpus; the oracle re-validates it against DuckDB's own
# ln before use (d21Sql chk CTE).
set -euo pipefail
out=/tmp/vout_sf30_d21
SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_VERIFY_ONLY=d21_cluster_curation \
  sbt -batch "runMain graft.Verify /root/repo/benchdata/sf30 $out" 2>&1 \
  | grep -E "\[verify\]|success" | tail -2
python3 /root/repo/tools/oracle_check.py /root/repo/benchdata/sf30 "$out"
echo D21_SF30_PIN_COMPLETE
