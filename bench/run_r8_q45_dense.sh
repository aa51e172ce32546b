#!/bin/bash
# Round-8: first q45 (symmetric n-gram Jaccard) number on the DENSE x1000
# corpus — the cell every prior round recorded as a one-box disk wall
# (~185 GB extrapolated candidate-join spill vs 75 GB local disk; see
# run_scale_x1000.sh header). The segmented verify (DedupSuite
# verifiedIntersections, dense branch) splits the pair set into K hash
# slices and verifies each as its own pass with a per-slice bloom prune,
# bounding peak disk at ~1/K. Auto-sizing (graft.verifyDiskBudgetBytes)
# picks K from estimated join bytes; this leg records the estimate, the
# chosen K, per-pass gate lines, and wall time.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
echo "=== q45 dense x1000 segmented ($HEAD_DESC) $(date +%H:%M:%S)"
df -B1G --output=avail / | tail -1 | xargs echo "free disk GB before:"
# 256 shuffle partitions: the q84 x1000 experiment showed per-task sorts at
# 32 partitions spill 5.1 GB that 256 removes entirely. 12 GiB disk budget →
# the auto-sizer cuts the pair×array intermediate into ~est/6GiB passes.
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x1000 \
  SPARK_GRAFT_SCALE_LABEL=x1000denseq45 SPARK_GRAFT_RERUN_BUDGET=0 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_EXTRA_CONFS="graft.verifyDiskBudgetBytes=12884901888;spark.rdd.compress=true" \
  SPARK_GRAFT_SCALE_QUERIES="q45_dedup_jaccard" \
  sbt -batch "runMain graft.ScalingBench" \
  > bench/results/r8_q45_dense_x1000.log 2>&1
rc=$?
grep -o '{"metric".*}' bench/results/r8_q45_dense_x1000.log \
  > bench/results/r8_q45_dense_x1000.json
python3 - bench/results/r8_q45_dense_x1000.json "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1])); d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
EOF
df -B1G --output=avail / | tail -1 | xargs echo "free disk GB after:"
grep -E "verify-prune gate|segmented verify|FAILED" bench/results/r8_q45_dense_x1000.log | sed 's/^\[error\] //'
echo "rc=$rc $(date +%H:%M:%S)"; cat bench/results/r8_q45_dense_x1000.json
