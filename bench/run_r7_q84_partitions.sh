#!/bin/bash
# Round-7 order 3: q84 controlled partition experiment at x1000 (5M docs),
# mirroring r6_x1000_partitions_q77_q87: 32 vs 256 shuffle partitions, plus
# the AQE deployment shape (start wide, let AQE coalesce). 48g heap like every
# x1000 leg. Stage evidence (spill vs CPU split) comes from the companion
# StageProfiler runs in run_r7_q84_stages.sh.
set -u
cd /root/repo
leg() {  # label extra_env...
  local label="$1"; shift
  echo "=== leg $label $(date +%H:%M:%S)"
  env SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=bench/data/x1000 \
    SPARK_GRAFT_SCALE_LABEL="$label" SPARK_GRAFT_RERUN_BUDGET=900 \
    SPARK_GRAFT_SCALE_QUERIES="q84_dedup_containment" "$@" \
    sbt -batch "runMain graft.ScalingBench" > "bench/results/r7_q84_${label}.log" 2>&1
  grep -o '{"metric".*}' "bench/results/r7_q84_${label}.log"
}
{
  echo '{"experiment":"shuffle-partitions at x1000 (q84 tail attribution)","legs":['
  leg x1000p32
  echo ','
  leg x1000p256 SPARK_GRAFT_SHUFFLE_PARTITIONS=256
  echo ','
  leg x1000aqe512 SPARK_GRAFT_SHUFFLE_PARTITIONS=512 \
    SPARK_GRAFT_EXTRA_CONFS="spark.sql.adaptive.coalescePartitions.initialPartitionNum=512"
  echo ']}'
} > bench/results/r7_x1000_partitions_q84.json.tmp
# strip inner newlines into the artifact format the r6 file used
python3 - <<'PY'
import re
raw = open('bench/results/r7_x1000_partitions_q84.json.tmp').read()
legs = re.findall(r'\{"metric".*?\}(?=\s*$)', raw, re.M)
head = '{"experiment":"shuffle-partitions at x1000 (q84 tail attribution)","legs":[\n'
open('bench/results/r7_x1000_partitions_q84.json','w').write(head + ',\n'.join(legs) + ']}\n')
PY
rm -f bench/results/r7_x1000_partitions_q84.json.tmp
echo "Q84 PARTITION EXPERIMENT COMPLETE $(date +%H:%M:%S)"
cat bench/results/r7_x1000_partitions_q84.json
