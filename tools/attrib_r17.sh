#!/bin/bash
# r17 attribution runs (VERDICT r16 item 1): isolated idle-host runs of
# the three un-attributed in-suite regressions, one JVM per query, the
# t6 / r16-shingle method. Oracle disabled (engine-side numbers only).
set -u
cd /root/repo
out=/tmp/attrib_r17.log
: > "$out"
for q in nn_lsh_buckets nn_label_knn_ivf pipe_span_clean; do
  echo "=== $q $(date +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY=$q \
  SPARK_GRAFT_ORACLE_CMD="" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep '{"metric"' | head -1 >> "$out"
done
echo "=== done $(date +%T)" >> "$out"
