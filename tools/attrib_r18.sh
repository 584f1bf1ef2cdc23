#!/bin/bash
# r18 attribution runs (VERDICT r17 item 1): the three un-attributed
# committed-series regressions (dd_incremental_indexed 1.99x,
# dd_simhash 1.94x, t6_recursive_cte 1.84x), the scripted method:
# (a) isolated idle-host run per query, one JVM each;
# (b) the three as one co-suite;
# (c) full suite WITHOUT the two r17 lookup queries (the first-wave
#     packing suspect) vs the full suite (the canonical series) — if
#     the flagged walls recover when dd_incremental_lookup and
#     nn_ivf_lookup leave the first wave, the cause is pool packing,
#     not engine.
# Runs from a PACKAGED jar (not sbt runMain) so later source edits in
# the working tree cannot contaminate the series mid-round.
set -u
cd /root/repo
jar=${1:-/tmp/graft_r18.jar}
out=${2:-/tmp/attrib_r18.log}
sf=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
opens=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  opens="$opens --add-opens java.base/$p=ALL-UNNAMED"
done
run_bench() { # $1 = BENCH_ONLY value ("-" = full suite, var unset), $2 = tag
  echo "=== $2 $(date +%T) loadavg=$(cut -d' ' -f1 /proc/loadavg)" >> "$out"
  local envonly=(env "SPARK_GRAFT_SF_DIR=$sf" "SPARK_GRAFT_ORACLE_CMD=")
  # an EMPTY BENCH_ONLY string is Some(Set("")) in the Bench matcher and
  # runs NOTHING — the full suite needs the var absent, not empty
  if [ "$1" != "-" ]; then envonly+=("SPARK_GRAFT_BENCH_ONLY=$1"); fi
  "${envonly[@]}" \
  java $opens -Xmx8g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$jar:/opt/spark/jars/*" graft.Bench 2>/dev/null \
    | grep '{"metric"' | head -1 >> "$out"
  # every Bench run rewrites BENCH_QUERIES_LATEST.json — restore the
  # committed artifact so (a) later list-generation reads 180 names,
  # (b) the attribution series never poses as the round's canonical map
  git -C /root/repo checkout -- BENCH_QUERIES_LATEST.json 2>/dev/null || true
}
: > "$out"
# the 180-name map from the COMMITTED artifact (the working-tree file is
# rewritten by every run, including these)
all=$(python3 -c "
import json, subprocess
out = subprocess.run(
    ['git', '-C', '/root/repo', 'show', 'HEAD:BENCH_QUERIES_LATEST.json'],
    capture_output=True, text=True).stdout
qs = sorted(json.loads(out)['queries'])
print(','.join(q for q in qs
               if q not in ('dd_incremental_lookup', 'nn_ivf_lookup')))
")
test -n "$all" || { echo 'FATAL: empty query list' >> "$out"; exit 1; }
for q in dd_incremental_indexed dd_simhash t6_recursive_cte; do
  run_bench "$q" "isolated:$q"
done
run_bench "dd_incremental_indexed,dd_simhash,t6_recursive_cte" "co-suite:3"
run_bench "$all" "full-minus-lookup:178"
run_bench "-" "full:180"
echo "=== done $(date +%T)" >> "$out"
