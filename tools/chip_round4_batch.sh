#!/bin/bash
# Round-4 chip work queue (VERDICT items 2/3/4-measure + re-bench), run
# SEQUENTIALLY — the chip is single-tenant.
# Usage: bash tools/chip_round4_batch.sh [logfile]
set -u
LOG=${1:-/tmp/chip_r4.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# VERDICT weak #1: e2e bench regression — 3 repeated runs for a variance
# bound (compare r02 2609 / r03 2481 img/s/chip e2e)
run python bench.py
run python bench.py
run python bench.py

# VERDICT weak #2: SparseInst canary RE-RUN post criterion-numerics fix
# (a1ab92c landed after the round-3 canary; 200 steps for a convincing
# decrease)
run python tools/train_canary_chip.py configs/coco/sparseinst/sparse_inst_r50_base.yaml 200 8 320

# VERDICT missing #5: committed traces + named taxes for SparseInst + DETR
run python tools/profile_train_zoo.py configs/coco/sparseinst/sparse_inst_r50_base.yaml 32 640 sparseinst_train
run python tools/profile_train_zoo.py configs/coco/detr/detr_256_6_6_r50.yaml 32 640 detr_train

# re-bench train throughput after the round-4 loss rebuilds (compare 192/231)
run python tools/bench_train_zoo.py configs/coco/sparseinst/sparse_inst_r50_base.yaml 32 640
run python tools/bench_train_zoo.py configs/coco/detr/detr_256_6_6_r50.yaml 32 640

# VERDICT missing #2 / r2 demand #10: real-loader on-chip train measurement
# (loader ceiling + fed-chip steady state, worker scaling 1/2/4)
run python tools/bench_real_loader_train.py 20 32 640 1
run python tools/bench_real_loader_train.py 20 32 640 2
run python tools/bench_real_loader_train.py 20 32 640 4

echo "ALL DONE" >> "$LOG"
