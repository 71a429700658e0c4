"""Multi-scale training.

The reference changes the train input size every 10 iters and broadcasts the
choice across ranks (``dist.broadcast``, meta_arch/yolo.py:131-146). On TPU
each input size is its own compiled executable, so the TPU-native version is:

  * a small static set of sizes (all multiples of 32),
  * a deterministic schedule size = f(step) — identical on every host, so
    no collective is needed,
  * jit caches one executable per size; after the first epoch every size is
    compiled and switching is free.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np


def size_for_step(
    step: int,
    sizes: Sequence[Tuple[int, int]],
    interval: int = 10,
    seed: int = 0,
) -> Tuple[int, int]:
    """Deterministic pseudo-random size choice, constant within ``interval``
    steps (every host computes the same value — the broadcast disappears)."""
    bucket = step // interval
    rng = np.random.default_rng(seed + bucket)
    return tuple(sizes[int(rng.integers(0, len(sizes)))])


class MultiScaleMapperWrapper:
    """Wrap a mapper so its ``input_size`` follows the step schedule.

    The trainer advances ``self.step`` (host-side int); workers read the
    current size when mapping. Batches are always homogeneous because the
    loader assembles batches from one mapper instance sequentially.
    """

    def __init__(
        self, mapper, sizes: Sequence[Tuple[int, int]],
        interval: int = 10, seed: int = 0,
    ):
        self.mapper = mapper
        self.sizes = [tuple(s) for s in sizes]
        self.interval = interval
        self.seed = seed
        self.step = 0

    def __call__(self, record: dict) -> Dict[str, np.ndarray]:
        self.mapper.input_size = size_for_step(
            self.step, self.sizes, self.interval, self.seed
        )
        return self.mapper(record)


def default_size_set(
    base: int = 640, span: int = 5, stride: int = 32
) -> List[Tuple[int, int]]:
    """Sizes base ± span*stride (the reference uses 320..608 around 416)."""
    return [
        (base + i * stride, base + i * stride)
        for i in range(-span, span + 1)
    ]
