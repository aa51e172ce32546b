#!/bin/bash
# Round-9 order #2 (carried r7/r8 stretch): convert the sparse-corpus bloom
# prune's measured 2.5x verify-shuffle-byte win into a WALL-CLOCK win by
# capping the disk budget — the world where unpruned verify bytes cannot just
# spill for free. On x1000_sparse (5M docs, coverage 0.05, candidate-pair
# bound 1.1e8):
#   on : default gates — prune engages, verify joins carry candidate arrays
#        only, NO segmentation (the engaged branch never needs the budget);
#   off: graft.verifyPruneCoverageMax=0 (prune disabled but the dense-branch
#        machinery kept) + 2 GiB budget — the full-gram verify must run as
#        K segmented passes to respect the same disk bound the pruned path
#        meets for free.
# Interleaved 3x per config (the r7 lesson: single runs are +-2x noisy);
# per-config MEDIAN is the number of record.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
echo "=== prune-vs-budget A/B ($HEAD_DESC) $(date +%H:%M:%S)"
for i in 1 2 3; do
  for cfg in on off; do
    label="r9_prune_budget_${cfg}${i}"
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
    grep -E "verify-prune gate|segmented verify" "bench/results/${label}.log" \
      | sed 's/^\[error\] //' | head -5
    tail -c 400 "bench/results/${label}.json" 2>/dev/null; echo
  done
done
echo "PRUNE BUDGET AB COMPLETE $(date +%H:%M:%S)"
