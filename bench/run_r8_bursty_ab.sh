#!/bin/bash
# Round-8 bursty-contention A/B (verdict r7 order #2 acceptance): replay the
# r7-style BURSTY load — pulses that overlap multi-second queries but leave
# quiet gaps the fixed-work probes can land in — and show the new
# bursty_contention verdict flags the run even when the probe-based
# inflation_estimate stays under the 2.0 contended threshold (the r7 gap).
# Leg 1 (clean) must stay all-false; leg 2 (pulsed 32-hog load, 1.8 s on /
# 1.2 s off — matching pulsed_load below) must record bursty_contention:true.
set -u
cd /root/repo
Q=q69_curation,q77_tfidf_topterms,q87_passage_dedup

run_leg() {  # label
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_QUERIES="$Q" \
    SPARK_GRAFT_BENCH_OUT="bench/results/r8_bursty_$1.json" \
    sbt -batch "runMain graft.Bench" > "bench/results/r8_bursty_$1.log" 2>&1
  python3 - "bench/results/r8_bursty_$1.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"{sys.argv[1]}: total={d['value']:.1f}s contended={d['contended_run']} "
      f"bursty={d['bursty_contention']} inflation={d['inflation_estimate']} "
      f"sentinel_median={d['cpu_ratio_sentinel_median']} ratios={d['run_cpu_ratio']}")
EOF
}

# 32 spinners, 1.8 s on / 1.2 s off (~r7's measured ~1.7x inflation), until
# killed. GRAFT_BURSTY_SPINNER is an inert marker so teardown can pkill THIS
# script's spinners only, not any unrelated busy-loop on a shared host.
pulsed_load() {
  while :; do
    for _ in $(seq 32); do
      (timeout 1.8 bash -c 'GRAFT_BURSTY_SPINNER=1; while :; do :; done') &
    done
    wait
    sleep 1.2
  done
}

echo "=== clean leg $(date +%H:%M:%S)"
run_leg clean
echo "=== bursty leg $(date +%H:%M:%S)"
pulsed_load & LOAD_PID=$!
run_leg loaded
kill "$LOAD_PID" 2>/dev/null; pkill -f 'GRAFT_BURSTY_SPINNER' 2>/dev/null
echo "BURSTY AB COMPLETE $(date +%H:%M:%S)"
