#!/bin/bash
# Round-5 measurement chain, part 6 — G3: the executor-faithful census
# at 2× the corpus (1.67M urls). The 208k→832k local census showed every
# component's N→4N efficiency rising with per-task work (extract 0.81 →
# 0.91); G2 measured the executor-faithful analog at 832k = 0.78. G3
# asks whether the same corpus-size trend carries the executor-faithful
# data path over the north rule's 0.8 bar.
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name cores, then env assignments
  local name=$1 cores=$2; shift 2
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.ScalingCensus $cores 1000 2048 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) ===" | tee -a $LOG/summary.txt
}

leg G3_lc1x8 8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=81920 GRAFT_REPS=2
leg G3_lc4x8 32 SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=22528 GRAFT_REPS=2

echo "PART6 DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
