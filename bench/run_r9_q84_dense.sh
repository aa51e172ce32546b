#!/bin/bash
# Round-9 order #5: close the dense-regime matrix for containment. q84 shares
# verifiedIntersections with q45, so the three-regime verify tail (plain /
# bloom-pruned / segmented) applies to it — but the only dense x1000
# containment number on record (r7: 222 s @ 256 partitions) predates the
# regime gate. Leg A runs the production defaults and records the gate's
# decision on this corpus; leg B forces a 2 GiB budget so the segmented
# path provably engages for the containment pair pipeline as well.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for leg in default budget2g; do
  label="r9_q84_dense_${leg}"
  extra="spark.rdd.compress=true"
  [ "$leg" = budget2g ] && extra="$extra;graft.verifyDiskBudgetBytes=2147483648"
  echo "=== $label ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x1000 \
    SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    SPARK_GRAFT_SCALE_QUERIES="q84_dedup_containment" \
    SPARK_GRAFT_EXTRA_CONFS="$extra" \
    sbt -batch "runMain graft.ScalingBench" \
    > "bench/results/${label}.log" 2>&1
  grep -o '{"metric".*}' "bench/results/${label}.log" > "bench/results/${label}.json" \
    || echo "NO JSON for $label"
  grep -E "verify-prune gate|segmented verify" "bench/results/${label}.log" \
    | sed 's/^\[error\] //' | head -10
done
echo "Q84 DENSE COMPLETE $(date +%H:%M:%S)"
