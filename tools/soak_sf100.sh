#!/bin/bash
# Decade probe (sf100 = 1000x graded scale): one JVM per query so a
# dying context cannot void its neighbors (the round-8 lesson), each
# run watchdogged and metric-instrumented. Per-query artifacts land in
# .soak/sf100_<q>.json; merge with tools/merge_soak.py afterwards.
# Runs on the compiled classes directly (tools/jrun.sh) so probes
# never contend for the sbt build lock. Each query JVM gets a PRIVATE
# scratch root ($OUT/tmp.<q>, via jrun.sh's GRAFT_TMPDIR) and only
# that directory is swept afterwards — a /tmp glob here would delete
# the live block-manager dirs of any concurrent Spark JVM (sbt test,
# a second soak) mid-run.
#
# Usage: tools/soak_sf100.sh <outdir> <timeout_s> <driver_mem> q1 [q2 ...]
# SOAK_DIR overrides the input dir (default localdata/sf100); the
# co-supplier graph family probes against localdata/sf100g (facts
# derived sf0.01 x 10000, where minOrders=30 leaves a real graph).
set -u
OUT=${1:?outdir}; TMO=${2:?timeout_s}; MEM=${3:?driver_mem}; shift 3
DIR=${SOAK_DIR:-/root/repo/localdata/sf100}
TAGBASE=$(basename "$DIR")
mkdir -p "$OUT"
cd /root/repo
for q in "$@"; do
  SCRATCH="$OUT/tmp.${TAGBASE}_${q}"
  rm -rf "$SCRATCH" 2>/dev/null
  echo "=== $q @ $TAGBASE (timeout ${TMO}s, heap $MEM) $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR="$DIR" \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 \
  SPARK_GRAFT_PASSES=1 SPARK_GRAFT_NO_WARMUP=1 SPARK_GRAFT_METRICS=1 \
  SPARK_GRAFT_TIMEOUT_S="$TMO" SPARK_GRAFT_ONLY="$q" \
  SPARK_DRIVER_MEM="$MEM" \
  GRAFT_TMPDIR="$SCRATCH" \
  SPARK_GRAFT_BENCH_OUT="$OUT/${TAGBASE}_${q}.json" \
  timeout $((TMO + 300)) tools/jrun.sh graft.Bench \
    > "$OUT/${TAGBASE}_${q}.log" 2>&1
  echo "    exit=$? $(tail -c 300 "$OUT/${TAGBASE}_${q}.json" 2>/dev/null)"
  rm -rf "$SCRATCH" 2>/dev/null
done
