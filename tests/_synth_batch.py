"""Synthetic training batches keyed by a build_system ``fields`` tuple.

Shared by the per-family engine tests and the full-YAML-zoo train-step
sweep (tests/test_config_zoo.py) so every config family gets a batch with
exactly the ground-truth fields its loss graph consumes.
"""

import jax.numpy as jnp
import numpy as np


def synth_batch(fields, b=2, g=4, s=64, num_keypoints=17):
    batch = {
        "image": jnp.full((b, s, s, 3), 114.0),
        "gt_boxes": jnp.tile(
            jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (b, g, 1)
        ),
        "gt_classes": jnp.ones((b, g), jnp.int32),
        "gt_valid": jnp.zeros((b, g), bool).at[:, 0].set(True),
    }
    if "gt_masks" in fields:
        m = np.zeros((b, g, s, s), np.float32)
        m[:, 0, 8:40, 8:40] = 1.0
        batch["gt_masks"] = jnp.asarray(m)
    if "gt_keypoints" in fields:
        k = np.zeros((b, g, num_keypoints, 3), np.float32)
        k[:, 0, :, 0] = 20.0
        k[:, 0, :, 1] = 20.0
        k[:, 0, :5, 2] = 2.0
        batch["gt_keypoints"] = jnp.asarray(k)
    if "gt_sem_seg" in fields:
        sem = np.zeros((b, s, s), np.int64)
        sem[:, 8:40, 8:40] = 1
        batch["gt_sem_seg"] = jnp.asarray(sem)
    return {k: v for k, v in batch.items() if k in fields}
