#!/bin/bash
# Round-14 controlled sf0.1 series: 3 full-suite Bench runs on an idle host,
# recorded so round-14 code (sparse/averaged/multiclass perceptron training,
# persisted media-fingerprint indexes + vs-index near-dup ×3 modalities + TVF,
# full curation chain q162, streaming media ingest + repetition gate,
# gen-committed text-index appends, the repetitionFilter pushdown fix,
# q158-q165) has per-query medians of record — the r13 series predates every
# round-14 main-source change.
set -u
cd /root/repo
HEAD_DESC=$(git describe --always --dirty 2>/dev/null || git rev-parse --short HEAD)
for i in 1 2 3; do
  echo "=== r14 sf0.1 run$i ($HEAD_DESC) $(date +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="bench/results/r14_sf0.1_run$i.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r14_sf0.1_run$i.log" 2>&1
  python3 - "bench/results/r14_sf0.1_run$i.json" "$HEAD_DESC" <<'EOF'
import json, sys
p, head = sys.argv[1], sys.argv[2]
d = json.load(open(p))
d["git_head"] = head
open(p, "w").write(json.dumps(d, separators=(",", ":")) + "\n")
EOF
  grep -E "WARNING|FAILED" "bench/results/r14_sf0.1_run$i.log" | sed 's/^\[error\] //' || true
  python3 - "bench/results/r14_sf0.1_run$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"run total={d['value']:.1f}s contended={d['contended_run']} bursty={d['bursty_contention']} "
      f"inflation={d['inflation_estimate']} sentinel_median={d['cpu_ratio_sentinel_median']} "
      f"calib={d['calibration_pre_sec']:.2f}/{d['calibration_post_sec']:.2f}")
EOF
  [ "$i" -lt 3 ] && sleep 60
done
echo "R14 SERIES COMPLETE $(date +%H:%M:%S)"
