#!/bin/bash
# Round-5 measurement chain, part 8 — H1: the COMPOSITE executor-faithful
# crawl pair at 6.7M urls (1000×8192). The composite local-cluster trend
# is 0.24 (208k) → 0.30 (832k) → 0.34 (1.67M) → 0.52 (3.3M), rising as
# per-round work amortizes the fixed multi-JVM constants; H1 extends it
# one more doubling. GRAFT_REPS=1 (untimed warmup + ONE timed rep per
# leg — wall-clock bounded; per-leg timestamps recorded here so a stall
# can be correlated after the fact; compare the legs' fetched counts in
# the JSON manually after the run — this script does not assert them).
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name cores, then env assignments
  local name=$1 cores=$2; shift 2
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.ScalingBench $cores 1000 8192 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
}

leg H1_lc1x8 8  SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=81920 GRAFT_REPS=1
leg H1_lc4x8 32 SPARK_DRIVER_MEM=24g SPARK_HOME=/opt/spark \
  SPARK_SCALA_VERSION=2.13 GRAFT_LOCAL_CLUSTER=22528 GRAFT_REPS=1

echo "PART8 DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
