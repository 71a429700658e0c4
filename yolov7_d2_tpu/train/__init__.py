from yolov7_d2_tpu.train.checkpoint import Checkpointer, strip_optimizer  # noqa: F401
from yolov7_d2_tpu.train.optimizer import build_optimizer  # noqa: F401
from yolov7_d2_tpu.train.schedules import (  # noqa: F401
    auto_scale_config,
    build_lr_schedule,
    warmup_cosine_lr,
    warmup_multistep_lr,
)
from yolov7_d2_tpu.train.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from yolov7_d2_tpu.train.trainer import (  # noqa: F401
    AugDisableHook,
    EvalHook,
    HookBase,
    IterationTimer,
    PeriodicCheckpointer,
    PeriodicWriter,
    Trainer,
)
