#!/bin/bash
# Round-5 measurement chain, part 5 — phase G re-run after the
# executor-registration fix (ScalingBench.session now blocks until the
# requested cores register; the first G attempt synthesized the corpus
# in a 2-slice layout because spark.range was planned before the
# local-cluster executors registered, so both legs measured a 2-core
# extract, not scaling).
#   G2. Census under the executor-faithful local-cluster harness at 832k,
#       [1,8,80g] vs [4,8,22g] (equal total executor memory): the
#       per-page data path's N-vs-4N-EXECUTORS efficiency — the census
#       analog of the north rule's exact criterion.
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name cores, then env assignments
  local name=$1 cores=$2; shift 2
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.ScalingCensus $cores 1000 1024 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) ===" | tee -a $LOG/summary.txt
}

leg G2_lc1x8 8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=81920 GRAFT_REPS=2
leg G2_lc4x8 32 SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=22528 GRAFT_REPS=2

echo "PART5 DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
