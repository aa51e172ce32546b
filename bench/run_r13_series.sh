#!/bin/bash
# Round-13 controlled sf0.1 series: 3 full-suite Bench runs on an idle host,
# recorded so round-13 code (byte-level BPE, video+audio near-dup, Gopher repetition signals,
# token-budget mixture, text-index append, q146-q156) has
# per-query medians of record — the r12 series of record predates
# every round-13 main-source change.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r13 sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r13_sf0.1_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r13_sf0.1_run$i.log" 2>&1
  python3 - "bench/results/r13_sf0.1_run$i.json" "$HEAD_DESC" <<'EOF'
import json, sys
p, head = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d["git_head"] = head
open(p, "w").write(json.dumps(d, separators=(",", ":")) + "\n")
EOF
  grep -E "WARNING|FAILED" "bench/results/r13_sf0.1_run$i.log" | sed 's/^\[error\] //' || true
  python3 - "bench/results/r13_sf0.1_run$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"run total={d['value']:.1f}s contended={d['contended_run']} bursty={d['bursty_contention']} "
      f"inflation={d['inflation_estimate']} sentinel_median={d['cpu_ratio_sentinel_median']} "
      f"calib={d['calibration_pre_sec']:.2f}/{d['calibration_post_sec']:.2f}")
EOF
done
echo "R11 SERIES COMPLETE $(date +%H:%M:%S)"
