#!/bin/bash
# Clean re-run of the q84 dense default-budget leg: the first default leg
# (r9_q84_dense_default) started seconds after the previous sbt JVM exited and
# its pre-calibration (9.9 s vs the 0.8 s idle pin) + probe base (3.3 s) show
# leg-start residue, so its contended_run flag is startup contention, not a
# property of the query. This leg runs on an idle host at the same confs.
set -u
cd /root/repo
label="r9_q84_dense_default_clean"
echo "=== $label $(git rev-parse --short HEAD) $(date +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x1000 \
  SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=0 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_SCALE_QUERIES="q84_dedup_containment" \
  SPARK_GRAFT_EXTRA_CONFS="spark.rdd.compress=true" \
  sbt -batch "runMain graft.ScalingBench" \
  > "bench/results/${label}.log" 2>&1
grep -o '{"metric".*}' "bench/results/${label}.log" > "bench/results/${label}.json" \
  || echo "NO JSON for $label"
grep -E "verify-prune gate|segmented verify" "bench/results/${label}.log" | sed 's/^\[error\] //'
echo "Q84 DEFAULT RERUN COMPLETE $(date +%H:%M:%S)"
