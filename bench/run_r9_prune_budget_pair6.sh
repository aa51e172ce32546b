#!/bin/bash
# Pair 6 of the prune-vs-budget A/B (same design as run_r9_prune_budget_ab.sh).
set -u
cd /root/repo
for cfg in on off; do
  label="r9_prune_budget_${cfg}6"
  extra="spark.rdd.compress=true"
  [ "$cfg" = off ] && extra="$extra;graft.verifyPruneCoverageMax=0;graft.verifyDiskBudgetBytes=2147483648"
  echo "=== $label $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=bench/data/x1000_sparse \
    SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    SPARK_GRAFT_SCALE_QUERIES="q45_dedup_jaccard" \
    SPARK_GRAFT_EXTRA_CONFS="$extra" \
    sbt -batch "runMain graft.ScalingBench" \
    > "bench/results/${label}.log" 2>&1
  grep -o '{"metric".*}' "bench/results/${label}.log" \
    > "bench/results/${label}.json" || echo "NO JSON for $label"
done
echo "PAIR6 COMPLETE $(date +%H:%M:%S)"
