#!/bin/bash
# Data-bound scaling series: x1 (sf0.1) -> x10 -> x100 scaled corpora.
# Per-leg: stdout JSON -> bench/results/r5_scale_<label>.json,
#          stderr (per-query progress) -> bench/results/r5_scale_<label>.log
set -u
cd /root/repo
for leg in "x1:/root/testdata/sf0.1" "x10:/root/repo/bench/data/x10" "x100:/root/repo/bench/data/x100"; do
  label="${leg%%:*}"; dir="${leg#*:}"
  echo "=== leg $label ($dir) $(date +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SCALE_LABEL="$label" \
    sbt -batch "runMain graft.ScalingBench" \
    2> "bench/results/r5_scale_${label}.log" \
    | grep -o '{"metric".*}' > "bench/results/r5_scale_${label}.json"
  echo "=== leg $label done $(date +%H:%M:%S): $(head -c 200 bench/results/r5_scale_${label}.json)"
done
echo "SERIES COMPLETE $(date +%H:%M:%S)"
