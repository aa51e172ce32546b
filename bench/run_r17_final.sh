#!/bin/bash
# Round-17 FINAL series at sf0.1: 3 full-suite Bench runs at the final
# round-17 head (the per-query medians of record — the earlier
# r17_sf0.1_run{1..4} series predates the anti-join gate commit), plus the
# 8-core control for the core-scaling sanity check.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r17final sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r17final_sf0.1_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r17final_sf0.1_run$i.log" 2>&1
  python3 - "bench/results/r17final_sf0.1_run$i.json" "$HEAD_DESC" <<'EOF'
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
echo "=== r17final c8 control ($HEAD_DESC) $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="bench/results/r17final_c8.json" \
  sbt -batch "runMain graft.Bench" > "bench/results/r17final_c8.log" 2>&1
python3 - "bench/results/r17final_c8.json" "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(f"c8 total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']}")
EOF
echo "R17 FINAL SERIES COMPLETE $(date +%H:%M:%S)"
