#!/bin/bash
# Interleaved 3x A/B of the q45 verify-prune on the sparse x1000 corpus:
# single runs proved +-2x noisy (JIT/page-cache), so the number of record is
# the per-config MEDIAN of three runs with configs alternated to spread
# machine drift evenly.
set -u
cd /root/repo
for i in 1 2 3; do
  for cfg in on off; do
    label="x1000sparse_ab_${cfg}${i}"
    extra=""
    [ "$cfg" = off ] && extra="graft.verifyPruneMinDocs=999999999"
    echo "=== $label $(date +%H:%M:%S)"
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=bench/data/x1000_sparse \
      SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
      SPARK_GRAFT_SCALE_QUERIES="q45_dedup_jaccard" \
      SPARK_GRAFT_EXTRA_CONFS="$extra" \
      sbt -batch "runMain graft.ScalingBench" 2>&1 | grep -o '{"metric".*}'
  done
done
echo "AB COMPLETE $(date +%H:%M:%S)"
