"""On-device bipartite matching (Hungarian-equivalent auction algorithm).

Every DETR-family and SparseInst matcher in the reference calls scipy's
``linear_sum_assignment`` on CPU **inside the training step**
(/root/reference/yolov7/utils/detr_utils.py:12,94,179,265;
loss/sparseinst_loss.py:305-350) — a host round-trip per step. On TPU that
sync would stall the pipeline, so matching runs on device as a Jacobi
auction (Bertsekas): fixed-shape, jit-safe, vmappable over the batch, and
ε-optimal (total cost within n·ε of the Hungarian optimum — for detection
matching this is indistinguishable from exact: tests compare against scipy).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -1e18


@partial(jax.jit, static_argnames=("max_iters",))
def auction_lap(
    benefit: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps: float = 1e-3,
    max_iters: int = 500,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize sum of benefit[i, col_of(i)] over distinct columns.

    benefit: [R, C]; row_valid: [R] rows to assign; col_valid: [C] columns
    allowed. Requires #valid rows <= #valid cols.

    Returns (col_of_row [R] int32 with -1 for unassigned/invalid rows,
    row_of_col [C] int32 with -1 for free columns).
    """
    R, C = benefit.shape
    # invalid columns get -inf benefit; invalid rows never bid.
    # optimization_barrier: materialize the benefit matrix before the loop —
    # otherwise XLA can fuse its (cls/L1/GIoU cost) computation into every
    # auction iteration (same pathology measured at 26x in ops/nms.py).
    b = jax.lax.optimization_barrier(
        jnp.where(col_valid[None, :], benefit, NEG)
    )
    # deterministic tie-breaking: tiny per-row priority
    tie = jnp.arange(R, dtype=jnp.float32)[:, None] * (eps * 1e-3)

    def cond(state):
        prices, col_of, row_of, it = state
        unassigned = (col_of < 0) & row_valid
        return jnp.any(unassigned) & (it < max_iters)

    def body(state):
        prices, col_of, row_of, it = state
        unassigned = (col_of < 0) & row_valid

        vals = b - prices[None, :]                       # [R, C]
        top2, idx2 = jax.lax.top_k(vals, 2)
        j_best = idx2[:, 0]
        bid_incr = top2[:, 0] - top2[:, 1] + eps
        bids = prices[j_best] + bid_incr - tie[:, 0]     # [R]
        bids = jnp.where(unassigned, bids, NEG)

        # per-object max bid (scatter-max), then pick the winning row
        obj_best_bid = jnp.full((C,), NEG).at[j_best].max(bids)
        is_winner = (
            unassigned
            & (bids > NEG * 0.5)
            & (bids >= obj_best_bid[j_best])
        )
        # resolve residual ties (identical bids): lowest row index wins
        winner_row = jnp.full((C,), R, jnp.int32).at[
            jnp.where(is_winner, j_best, C)
        ].min(
            jnp.where(is_winner, jnp.arange(R, dtype=jnp.int32), R),
            mode="drop",
        )
        has_winner = winner_row < R

        # evict previous owner of each won column
        prev_owner = jnp.where(has_winner, row_of, -1)   # [C]
        evict_mask = jnp.zeros((R,), bool).at[
            jnp.where(prev_owner >= 0, prev_owner, R)
        ].set(True, mode="drop")
        col_of = jnp.where(evict_mask, -1, col_of)

        # assign winners
        win_rows = winner_row                             # [C] (R = none)
        col_idx = jnp.arange(C, dtype=jnp.int32)
        col_of = col_of.at[jnp.where(has_winner, win_rows, R)].set(
            jnp.where(has_winner, col_idx, -1), mode="drop"
        )
        row_of = jnp.where(has_winner, win_rows, row_of)
        prices = jnp.where(
            has_winner, obj_best_bid, prices
        )
        return prices, col_of, row_of, it + 1

    prices0 = jnp.zeros((C,))
    col_of0 = jnp.full((R,), -1, jnp.int32)
    row_of0 = jnp.full((C,), -1, jnp.int32)
    _, col_of, row_of, _ = jax.lax.while_loop(
        cond, body, (prices0, col_of0, row_of0, jnp.zeros((), jnp.int32))
    )
    col_of = jnp.where(row_valid, col_of, -1)
    return col_of, row_of


def hungarian_match(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps: float = 1e-3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minimize total cost (the scipy.linear_sum_assignment drop-in).

    cost: [R, C] with rows = ground truths, cols = predictions (or vice
    versa); returns (col_of_row, row_of_col) as in :func:`auction_lap`.
    """
    scale = jnp.maximum(jnp.max(jnp.abs(cost)), 1.0)
    return auction_lap(-cost / scale, row_valid, col_valid, eps=eps)
