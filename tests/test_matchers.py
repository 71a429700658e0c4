import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from yolov7_d2_tpu.ops.matchers import hungarian_match


def _total_cost(cost, col_of_row):
    return sum(
        cost[i, j] for i, j in enumerate(col_of_row) if j >= 0
    )


def test_simple_exact_match():
    cost = jnp.array(
        [[1.0, 100.0, 100.0], [100.0, 1.0, 100.0], [100.0, 100.0, 1.0]]
    )
    col_of, row_of = hungarian_match(
        cost, jnp.ones(3, bool), jnp.ones(3, bool)
    )
    np.testing.assert_array_equal(np.asarray(col_of), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(row_of), [0, 1, 2])


def test_permuted_match():
    cost = jnp.array(
        [[100.0, 1.0, 100.0], [100.0, 100.0, 1.0], [1.0, 100.0, 100.0]]
    )
    col_of, _ = hungarian_match(cost, jnp.ones(3, bool), jnp.ones(3, bool))
    np.testing.assert_array_equal(np.asarray(col_of), [1, 2, 0])


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(5, 8), (10, 10), (20, 64)])
def test_matches_scipy_total_cost(seed, shape):
    rng = np.random.default_rng(seed)
    R, C = shape
    cost = rng.uniform(0, 10, (R, C)).astype(np.float32)
    col_of, _ = hungarian_match(
        jnp.asarray(cost), jnp.ones(R, bool), jnp.ones(C, bool), eps=1e-4
    )
    col_of = np.asarray(col_of)
    # valid one-to-one assignment
    assert (col_of >= 0).all()
    assert len(set(col_of.tolist())) == R
    ours = _total_cost(cost, col_of)
    ri, ci = linear_sum_assignment(cost)
    optimal = cost[ri, ci].sum()
    # ε-optimal: within a small margin of the true optimum
    assert ours <= optimal + 0.05 * R


def test_invalid_rows_and_cols_ignored():
    cost = jnp.array(
        [[1.0, 2.0, 3.0], [2.0, 1.0, 3.0], [9.0, 9.0, 9.0]]
    )
    row_valid = jnp.array([True, True, False])
    col_valid = jnp.array([True, True, False])
    col_of, row_of = hungarian_match(cost, row_valid, col_valid)
    col_of = np.asarray(col_of)
    assert col_of[2] == -1
    assert set(col_of[:2].tolist()) == {0, 1}
    assert int(row_of[2]) == -1


def test_vmappable():
    import jax

    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 5, (4, 6, 9)).astype(np.float32))
    rv = jnp.ones((4, 6), bool)
    cv = jnp.ones((4, 9), bool)
    col_of, _ = jax.vmap(lambda c, r, v: hungarian_match(c, r, v))(costs, rv, cv)
    assert col_of.shape == (4, 6)
    for b in range(4):
        assigned = np.asarray(col_of[b])
        assert len(set(assigned.tolist())) == 6
