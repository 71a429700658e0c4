#!/bin/bash
# Round-4 chip work queue (VERDICT items 2/5 + re-bench), run SEQUENTIALLY —
# the chip is single-tenant. Usage: bash tools/chip_round4_batch.sh [logfile]
set -u
LOG=${1:-/tmp/chip_r4.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

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

echo "ALL DONE" >> "$LOG"
