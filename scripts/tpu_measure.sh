#!/bin/bash
# Post-outage TPU measurement sequence. Run from the repo root as soon as
# the chip is reachable. Each step has a hard timeout so a Mosaic-compile
# stall can't eat the session; results land in /tmp/tpu_measure.log.
set -x
cd /root/repo
LOG=/tmp/tpu_measure.log
: > "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  tag=$1; t=$2; shift 2
  echo "=== $tag ($(date -u)) ===" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# 1. headline bench, default path (fused kernels on)
run bench_B1024 2400 python bench.py
# 2. bigger batch: BASELINE metric is at 4096/chip
BENCH_BATCH=4096 run bench_B4096 2400 python bench.py
# 3. fallback comparison: no-Pallas path (isolate kernel contribution)
ROBOGYM_TPU_NO_PALLAS=1 run bench_B1024_nopallas 2400 python bench.py
# 4. wrapped stack
BENCH_WRAPPED=1 run bench_wrapped 2400 python bench.py
# 5. per-phase profile
run profile_phases 3600 python scripts/profile_phases.py
echo "ALL DONE $(date -u)" >> "$LOG"
