#!/bin/bash
# Round-3 chip work queue (VERDICT items 7/9 + K sensitivity), run
# SEQUENTIALLY — the chip is single-tenant. Each line appends to the log;
# rerun-safe. Usage: bash tools/chip_round3_batch.sh [logfile]
set -u
LOG=${1:-/tmp/chip_r3.log}
cd "$(dirname "$0")/.."

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}

# item 7: steady-state TRAIN throughput, SparseInst + DETR (batch swept)
run python tools/bench_train_zoo.py configs/coco/sparseinst/sparse_inst_r50_base.yaml 32 640
run python tools/bench_train_zoo.py configs/coco/sparseinst/sparse_inst_r50_base.yaml 64 640
run python tools/bench_train_zoo.py configs/coco/detr/detr_256_6_6_r50.yaml 32 640
run python tools/bench_train_zoo.py configs/coco/detr/detr_256_6_6_r50.yaml 64 640

# item 9: canaries for uncovered families (loss must DECREASE over 50 steps)
run python tools/train_canary_chip.py configs/coco/yolox_kpts.yaml 50 8 320
run python tools/train_canary_chip.py configs/coco/yolof_r50.yaml 50 8 320
run python tools/train_canary_chip.py configs/coco/dla34_yolox.yaml 50 8 320

# item 10: real mosaic mp_loader feeding the chip (vs dummy-batch numbers)
run python tools/bench_real_loader_train.py 20 32 640 1
run python tools/bench_real_loader_train.py 20 32 640 2

# item 4 addendum: SimOTA prefilter K sensitivity @bs128
run python tools/profile_train_step.py 128 1024
run python tools/profile_train_step.py 128 4096

echo "ALL DONE" >> "$LOG"
