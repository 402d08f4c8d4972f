#!/bin/bash
# Round-5 measurement chain, part 2 (after the ENOSPC fix in SparkTune:
# spark.cleaner.periodicGC.interval=2min bounds shuffle scratch).
#   B. Executor-faithful local-cluster trend extension at the 3.3M corpus
#      (1000x4096): [1,8,80g] vs [4,8,22g], equal total executor memory,
#      warmup + best-of-2 per leg, fresh process per leg.
#   C. Round-5 local[8] vs local[32] standard pair at 208k (1000x256),
#      GRAFT_REPS=3 best-of, 48g driver.
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name, then env assignments as remaining args
  local name=$1; shift
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.ScalingBench $CORES $NH $BP 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
}

# --- Phase B: local-cluster 3.3M ---
NH=1000 BP=4096
CORES=8  leg B_lc1x8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=81920 GRAFT_REPS=2
CORES=32 leg B_lc4x8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=22528 GRAFT_REPS=2

# --- Phase C: round-5 local[8] vs local[32] pair at 208k ---
NH=1000 BP=256
CORES=8  leg C_l8  SPARK_DRIVER_MEM=48g GRAFT_REPS=3
CORES=32 leg C_l32 SPARK_DRIVER_MEM=48g GRAFT_REPS=3

echo "ALL LEGS DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
