#!/bin/bash
# Round-7 bloom-prune measurement: q45/q84 on dense vs sparse corpora.
# Dense x100 at 8g hit a marginal AGGREGATE_OUT_OF_MEMORY in one run (r6 passed
# at the same heap); 16g removes the flakiness at x100, 48g matches the r6
# x1000 methodology.
set -u
cd /root/repo
run_leg() {  # label dir mem queries
  echo "=== leg $1 ($2, $3) $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM="$3" SPARK_GRAFT_SF_DIR="$2" SPARK_GRAFT_SCALE_LABEL="$1" \
    SPARK_GRAFT_SCALE_QUERIES="$4" \
    sbt -batch "runMain graft.ScalingBench" > "bench/results/r7_prune_$1.log" 2>&1
  grep -o '{"metric".*}' "bench/results/r7_prune_$1.log" > "bench/results/r7_prune_$1.json"
  grep -E "verify-prune gate|FAILED" "bench/results/r7_prune_$1.log" | sed 's/^\[error\] //'
  cat "bench/results/r7_prune_$1.json"
}
run_leg x100        bench/data/x100         16g q45_dedup_jaccard,q84_dedup_containment
run_leg x100sparse  bench/data/x100_sparse  16g q45_dedup_jaccard,q84_dedup_containment
run_leg x1000sparse bench/data/x1000_sparse 48g q45_dedup_jaccard,q84_dedup_containment
echo "PRUNE SERIES COMPLETE $(date +%H:%M:%S)"
