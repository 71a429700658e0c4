"""LazyConfig optimizer fragments (reference configs/common/optim.py)."""

sgd = dict(name="sgd", base_lr=0.01, momentum=0.9, weight_decay=5e-4,
           nesterov=True)
adamw = dict(name="adamw", base_lr=1e-4, weight_decay=1e-4,
             backbone_multiplier=0.1)
