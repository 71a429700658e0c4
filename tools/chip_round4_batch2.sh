#!/bin/bash
# Round-4 chip batch 2: the input-pipeline measurements (VERDICT missing #2,
# r2 demand #10) — host-mosaic loader vs DEVICE-side fused aug.
set -u
LOG=${1:-/tmp/chip_r4b.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# host-mosaic pipeline: loader ceiling + fed-chip steady state, worker scaling
run python tools/bench_real_loader_train.py 20 32 640 1
run python tools/bench_real_loader_train.py 20 32 640 2
run python tools/bench_real_loader_train.py 20 32 640 4

# device-side fused aug: aug-only rate, fused train ceiling, real tile loader
run python tools/bench_device_aug_train.py 20 32 640 4
run python tools/bench_device_aug_train.py 30 128 640 4

echo "ALL DONE" >> "$LOG"
