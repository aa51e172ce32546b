#!/bin/bash
# Re-run of the off5 leg (killed by session teardown mid-run at 19:52).
set -u
cd /root/repo
label="r9_prune_budget_off5"
echo "=== $label $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=bench/data/x1000_sparse \
  SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_SCALE_QUERIES="q45_dedup_jaccard" \
  SPARK_GRAFT_EXTRA_CONFS="spark.rdd.compress=true;graft.verifyPruneCoverageMax=0;graft.verifyDiskBudgetBytes=2147483648" \
  sbt -batch "runMain graft.ScalingBench" \
  > "bench/results/${label}.log" 2>&1
grep -o '{"metric".*}' "bench/results/${label}.log" \
  > "bench/results/${label}.json" || echo "NO JSON for $label"
echo "OFF5 COMPLETE $(date +%H:%M:%S)"
