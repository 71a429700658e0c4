from yolov7_d2_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    build_mesh,
    replicated,
    shard_batch_pytree,
    state_shardings,
)
