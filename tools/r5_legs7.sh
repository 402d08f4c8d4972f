#!/bin/bash
# Round-5 measurement chain, part 7 — G4: the executor-faithful census
# at 4× the G2 corpus (3.3M urls). G2/G3 measured the per-page data
# path at 0.78 (832k) → 0.83 (1.67M) across 1→4 separate executor
# JVMs; G4 extends the trend one more doubling to show the bar-met
# number is the trend's continuation, not a single lucky point.
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name cores, then env assignments
  local name=$1 cores=$2; shift 2
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.ScalingCensus $cores 1000 4096 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) ===" | tee -a $LOG/summary.txt
}

leg G4_lc1x8 8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=81920 GRAFT_REPS=2
leg G4_lc4x8 32 SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=22528 GRAFT_REPS=2

echo "PART7 DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
