"""LazyConfig train fragment (reference configs/common/train.py:1-20)."""

train = dict(
    output_dir="./output",
    max_iter=90000,
    amp=dict(enabled=True),          # bf16 on TPU
    checkpointer=dict(period=5000, max_to_keep=5),
    eval_period=5000,
    log_period=20,
    device="tpu",
    seed=0,
)
