#!/bin/bash
# Round-17 "before" series at sf0.1: 3 full-suite Bench runs at the round-16
# verdict head (62e0403 / f45df7a code), recorded so the round-17 optimization
# A/B has per-query before-medians measured in THIS environment.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r17 before sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r17_before_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r17_before_run$i.log" 2>&1
  python3 - "bench/results/r17_before_run$i.json" "$HEAD_DESC" <<'EOF'
import json, sys
p, head = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d["git_head"] = head
open(p, "w").write(json.dumps(d, separators=(",", ":")) + "\n")
EOF
  python3 - "bench/results/r17_before_run$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"run total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']}")
EOF
  [ "$i" -lt 3 ] && sleep 30
done
echo "R17 BEFORE SERIES COMPLETE $(date +%H:%M:%S)"
