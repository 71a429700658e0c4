"""LazyConfig LR schedules (reference configs/common/coco_schedule.py):
the classic COCO 1x/3x multi-step plans expressed as plain dicts."""

def _epochs(n):
    iters_per_epoch = 117266 // 64  # COCO train size / reference batch
    return n * iters_per_epoch

lr_multiplier_1x = dict(
    scheduler="WarmupMultiStepLR",
    steps=[_epochs(8), _epochs(11)], max_iter=_epochs(12),
    warmup_iters=1000, gamma=0.1,
)
lr_multiplier_3x = dict(
    scheduler="WarmupMultiStepLR",
    steps=[_epochs(28), _epochs(34)], max_iter=_epochs(36),
    warmup_iters=1000, gamma=0.1,
)
lr_cosine = dict(
    scheduler="WarmupCosineLR", max_iter=_epochs(25), warmup_iters=1000,
)
