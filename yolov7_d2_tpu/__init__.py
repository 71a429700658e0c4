"""yolov7_d2_tpu — a TPU-native (JAX/XLA/Pallas/pjit) detection, instance
segmentation and keypoint framework with the capability surface of
lucasjinreal/yolov7_d2 (reference mounted at /root/reference).

Design stance (not a port):
  * Functional core: models are pure ``init/apply`` pytrees (flax.linen);
    meta-architectures compose ``backbone -> neck -> head -> loss`` under a
    single jitted ``train_step(state, batch, rng)``.
  * Static shapes everywhere: fixed ``max_boxes`` label tensors, fixed
    ``max_detections`` NMS outputs with validity masks, letterboxed batches.
  * NHWC layout + bfloat16 compute on the MXU; f32 params and loss math.
  * Parallelism via ``jax.sharding.Mesh`` + NamedSharding (DP over the
    ``data`` axis — the reference's only strategy, cf. SURVEY.md §2.11 —
    with optional tensor sharding of wide convolutions over ``model``).
"""

__version__ = "0.1.0"

from yolov7_d2_tpu.core.registry import Registry  # noqa: F401
