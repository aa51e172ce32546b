#!/bin/bash
# Round-7 order 5: q116 on the DENSE events corpora (same 30-day time axis,
# N x rows per (window, group) - ScaleData.scaleEventsDense). Scaling legs at
# x10/x100/x1000 plus StageProfiler shuffle-bytes evidence at x1000: the
# bounded per-group heaps must cap the exchange at k rows per (window, group)
# per map partition, so shuffle bytes stay roughly FLAT while input grows 100x.
set -u
cd /root/repo
for leg in "evdx10:bench/data/evd_x10:8g" "evdx100:bench/data/evd_x100:16g" "evdx1000:bench/data/evd_x1000:48g"; do
  IFS=: read -r label dir mem <<< "$leg"
  echo "=== leg $label ($dir, $mem) $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM="$mem" SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SCALE_LABEL="$label" \
    SPARK_GRAFT_SCALE_QUERIES="q116_windowed_topk" \
    sbt -batch "runMain graft.ScalingBench" > "bench/results/r7_scale_${label}.log" 2>&1
  grep -o '{"metric".*}' "bench/results/r7_scale_${label}.log" > "bench/results/r7_scale_${label}.json"
  cat "bench/results/r7_scale_${label}.json"
done
{
  echo "== q116 evd_x100 stages $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=16g sbt -batch "runMain graft.tools.StageProfiler bench/data/evd_x100 q116_windowed_topk" 2>&1 | sed 's/^\[info\] //; s/^\[error\] //' | grep -E "^== |^  \["
  echo "== q116 evd_x1000 stages $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.StageProfiler bench/data/evd_x1000 q116_windowed_topk" 2>&1 | sed 's/^\[info\] //; s/^\[error\] //' | grep -E "^== |^  \["
} > bench/results/r7_q116_dense_stages.txt
echo "EVENTS DENSE COMPLETE $(date +%H:%M:%S)"
cat bench/results/r7_q116_dense_stages.txt
