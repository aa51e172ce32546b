#!/bin/bash
# Round-17 series C at sf0.1: the window that inflated series B uniformly
# (~20%, documented in OPTIMIZATION_r17.md) has passed — a clean probe run
# at the same final head measured 184.2 s (sentinel 1.08). Re-record the
# final-head medians of record in the recovered window, 3 runs + the 8-core
# control.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r17C sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r17C_sf0.1_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r17C_sf0.1_run$i.log" 2>&1
  python3 - "bench/results/r17C_sf0.1_run$i.json" "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(f"run total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']} "
      f"contended={d['contended_run']} bursty={d['bursty_contention']} "
      f"sentinel={d['cpu_ratio_sentinel_median']}")
EOF
  sleep 45
done
echo "=== r17C c8 control ($HEAD_DESC) $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="bench/results/r17C_c8.json" \
  sbt -batch "runMain graft.Bench" > "bench/results/r17C_c8.log" 2>&1
python3 - "bench/results/r17C_c8.json" "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(f"c8 total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']}")
EOF
echo "R17 SERIES C COMPLETE $(date +%H:%M:%S)"
