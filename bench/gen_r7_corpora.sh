#!/bin/bash
# Round-7 corpus generation: sparse / zipf / dense-events ScaleData variants
# plus the dense x100/x1000 documents the partition experiment + gate checks need.
set -u
CP="/tmp/graft-classes-r7:/opt/spark/jars/*"
J="java -Xmx40g -cp $CP graft.ScaleData"
SRC=/root/testdata/sf0.1
D=/root/repo/bench/data
mkdir -p "$D"
run() { echo "=== $* $(date +%H:%M:%S)"; $J "$@" || echo "FAILED: $*"; df -h / | tail -1; }
run "$SRC" "$D/x100"          100  documents
run "$SRC" "$D/x100_sparse"   100  documents_sparse
run "$SRC" "$D/x100_zipf"     100  documents_zipf
run "$SRC" "$D/evd_x10"       10   events_dense
run "$SRC" "$D/evd_x100"      100  events_dense
run "$SRC" "$D/x1000"         1000 documents
run "$SRC" "$D/x1000_sparse"  1000 documents_sparse
run "$SRC" "$D/evd_x1000"     1000 events_dense
echo "GEN COMPLETE $(date +%H:%M:%S)"
