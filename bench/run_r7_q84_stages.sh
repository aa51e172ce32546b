#!/bin/bash
# Stage-level evidence for the q84 partition experiment: per-stage run/cpu/
# shuffle/spill at 32 and 256 partitions, fresh JVM each (the StageProfiler
# methodology from r6_x1000_partitions_stages.txt).
set -u
cd /root/repo
{
  echo "== q84 x1000 p32 $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.StageProfiler bench/data/x1000 q84_dedup_containment" 2>&1 | sed 's/^\[info\] //; s/^\[error\] //' | grep -E "^== |^  \["
  echo "== q84 x1000 p256 $(date +%H:%M:%S)"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    sbt -batch "runMain graft.tools.StageProfiler bench/data/x1000 q84_dedup_containment" 2>&1 | sed 's/^\[info\] //; s/^\[error\] //' | grep -E "^== |^  \["
} > bench/results/r7_x1000_partitions_q84_stages.txt
echo "Q84 STAGES COMPLETE"
