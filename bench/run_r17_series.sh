#!/bin/bash
# Round-17 after-series at sf0.1: 3 full-suite Bench runs at the committed
# optimization head (per-query medians of record for the round-17 A/B),
# plus one 8-core control run for the core-scaling sanity check (the r16
# pathology was the 8-core suite beating the 32-core one).
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r17 sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r17_sf0.1_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r17_sf0.1_run$i.log" 2>&1
  python3 - "bench/results/r17_sf0.1_run$i.json" "$HEAD_DESC" <<'EOF'
import json, sys
p, head = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d["git_head"] = head
open(p, "w").write(json.dumps(d, separators=(",", ":")) + "\n")
EOF
  python3 - "bench/results/r17_sf0.1_run$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"run total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']} "
      f"contended={d['contended_run']} bursty={d['bursty_contention']} "
      f"sentinel={d['cpu_ratio_sentinel_median']}")
EOF
  sleep 45
done
echo "=== r17 sf0.1 c8 control ($HEAD_DESC) $(date +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_BENCH_OUT="bench/results/r17_c8.json" \
  sbt -batch "runMain graft.Bench" > "bench/results/r17_c8.log" 2>&1
python3 - "bench/results/r17_c8.json" "$HEAD_DESC" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
d["git_head"] = sys.argv[2]
open(sys.argv[1], "w").write(json.dumps(d, separators=(",", ":")) + "\n")
print(f"c8 total={d['value']:.1f}s n={d['n_queries']} failures={d['n_failures']}")
EOF
echo "R17 SERIES COMPLETE $(date +%H:%M:%S)"
