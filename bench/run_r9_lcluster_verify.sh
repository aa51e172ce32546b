#!/bin/bash
# Round-9 order #1: validate the segmented verify's synchronous shuffle
# reclaim in a MULTI-EXECUTOR topology (local-cluster[2,16,4096] — separate
# executor OS processes, so per-pass cleanup is a real BlockManager
# RemoveShuffle broadcast, not a driver-local unlink). Records per-pass
# executor-side blockmgr disk (peak + end) and the segmented-vs-unsegmented
# A/B on the same topology; byte equality checked in-run via checksums.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
LDIR=/root/repo/bench/tmp/lcluster
rm -rf "$LDIR"; mkdir -p "$LDIR"
echo "=== local-cluster segmented verify ($HEAD_DESC) $(date +%H:%M:%S)"
df -B1G --output=avail / | tail -1 | xargs echo "free disk GB before:"
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS="$LDIR" \
  SPARK_DRIVER_MEM=8g \
  SPARK_GRAFT_SF_DIR=/root/repo/bench/data/x100 \
  SPARK_GRAFT_MASTER="local-cluster[2,16,6144]" \
  SPARK_GRAFT_EXEC_MEM=6g \
  SPARK_GRAFT_LOCAL_DIR="$LDIR" \
  SPARK_GRAFT_VERIFY_BUDGET=$((1 << 30)) \
  SPARK_GRAFT_OUT=bench/results/r9_lcluster_verify.json \
  sbt -batch "runMain graft.tools.LocalClusterVerify" \
  > bench/results/r9_lcluster_verify.log 2>&1
rc=$?
python3 - bench/results/r9_lcluster_verify.json "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1])); d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(json.dumps(d, indent=1)[:2000])
EOF
rm -rf "$LDIR"
grep -E "verify-prune gate|segmented verify|lcverify|FAILED|Exception" \
  bench/results/r9_lcluster_verify.log | sed 's/^\[error\] //' | head -40
echo "rc=$rc $(date +%H:%M:%S)"
