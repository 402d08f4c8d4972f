#!/bin/bash
# Round-5 measurement chain, part 3.
#   D. Clean local[8] vs local[32] pair at 208k, INTERLEAVED legs
#      (8,32,8,32 — fresh process each, GRAFT_REPS=2 in-process,
#      best-of-per-level across legs): the part-2 sequential pair was
#      stall-contaminated (local[32] best 94.4 s vs the historical ~59 s,
#      slower than local[8] in absolute — an inversion every prior record
#      contradicts).
#   E. Per-component scaling census at 208k: one process per parallelism
#      level, 4 components x (warmup + best-of-3) each.
# One leg per process; never compile/test concurrently (timing purity).
set -u
cd /root/repo
LOG=/tmp/r5_legs
mkdir -p $LOG

leg() { # name main cores, then env assignments
  local name=$1 main=$2 cores=$3; shift 3
  echo "=== leg $name start $(date -u +%H:%M:%S) df=$(df --output=avail -h / | tail -1 | tr -d ' ') ===" | tee -a $LOG/summary.txt
  env "$@" sbt -batch "runMain graft.$main $cores 1000 256 30" \
    > $LOG/$name.out 2>&1
  grep '"metric"' $LOG/$name.out | tee -a $LOG/summary.txt
  echo "=== leg $name end $(date -u +%H:%M:%S) ===" | tee -a $LOG/summary.txt
}

# --- Phase D: interleaved standard pair ---
leg D_l8a  ScalingBench 8  SPARK_DRIVER_MEM=48g GRAFT_REPS=2
leg D_l32a ScalingBench 32 SPARK_DRIVER_MEM=48g GRAFT_REPS=2
leg D_l8b  ScalingBench 8  SPARK_DRIVER_MEM=48g GRAFT_REPS=2
leg D_l32b ScalingBench 32 SPARK_DRIVER_MEM=48g GRAFT_REPS=2

# --- Phase E: per-component census ---
leg E_c8  ScalingCensus 8  SPARK_DRIVER_MEM=48g GRAFT_REPS=3
leg E_c32 ScalingCensus 32 SPARK_DRIVER_MEM=48g GRAFT_REPS=3

echo "PART3 DONE $(date -u +%H:%M:%S)" | tee -a $LOG/summary.txt
