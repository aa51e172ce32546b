#!/bin/bash
# Re-run of the forced-budget containment leg at the final main-source HEAD:
# the first budget2g leg predates ScalingBench's settled probe, so its
# artifact carries a self-inflicted contended_queries 6.84x from its own
# post-query cleanup drain (in-query run/cpu 1.18 was clean). This leg
# validates the port on the exact shape that produced the flag.
set -u
cd /root/repo
label="r9_q84_dense_budget2g_settled"
echo "=== $label $(git rev-parse --short HEAD) $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x1000 \
  SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_SCALE_QUERIES="q84_dedup_containment" \
  SPARK_GRAFT_EXTRA_CONFS="spark.rdd.compress=true;graft.verifyDiskBudgetBytes=2147483648" \
  sbt -batch "runMain graft.ScalingBench" \
  > "bench/results/${label}.log" 2>&1
grep -o '{"metric".*}' "bench/results/${label}.log" > "bench/results/${label}.json" \
  || echo "NO JSON for $label"
grep -E "verify-prune gate|segmented verify" "bench/results/${label}.log" | sed 's/^\[error\] //' | head -12
echo "Q84 BUDGET2G SETTLED COMPLETE $(date +%H:%M:%S)"
