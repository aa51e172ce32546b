#!/bin/bash
# x1000 leg (5M docs / 2M vectors): full default query set, 48g heap.
set -u
cd /root/repo
echo "=== leg x1000 $(date +%H:%M:%S) ==="
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x1000 \
  SPARK_GRAFT_SCALE_LABEL=x1000 SPARK_GRAFT_RERUN_BUDGET=900 \
  sbt -batch "runMain graft.ScalingBench" \
  | tee bench/results/r5_scale_x1000.full.log \
  | grep -o '{"metric".*}' > bench/results/r5_scale_x1000.json
echo "=== leg x1000 done $(date +%H:%M:%S): $(head -c 200 bench/results/r5_scale_x1000.json)"
