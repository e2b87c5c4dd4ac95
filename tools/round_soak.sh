#!/bin/bash
# Standard round soak driver — run this after `sbt test` each round.
# Order matters: the recall gates run FIRST and their exit status
# propagates, so a dedup cap regression fails THIS command instead of
# hiding until someone remembers to run RecallSoak by hand (r8
# verdict task 7). Soak inputs regenerate on demand (SoakData is
# deterministic, so a regenerated dir is bit-identical).
#
# Usage: tools/round_soak.sh [round_tag]
set -eu
cd /root/repo
TAG=${1:-latest}

# 100x documents corpus for the recall gates
if [ ! -d localdata/sf10/documents.parquet ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.SoakData /root/testdata/sf0.1 localdata/sf10 100 closed documents"
fi
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.RecallSoak localdata/sf10 /root/repo/RECALL_SF10_${TAG}.json"

# heaps-mode (adversarial near-dup head) corpus, same gates
if [ ! -d localdata/sf1h/documents.parquet ]; then
  SPARK_GRAFT_CPUS=32 sbt -batch \
    "runMain graft.SoakData /root/testdata/sf0.1 localdata/sf1h 10 heaps documents"
fi
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=48g sbt -batch \
  "runMain graft.RecallSoak localdata/sf1h /root/repo/RECALL_SF1H_${TAG}.json"

echo "round_soak: all recall gates green"
