

def test_adam_bf16_state_dtype():
    """SOLVER.ADAM_BF16_STATE keeps adam's first moment (mu) in bf16 and
    the second moment (nu) in f32 (optax mu_dtype — the optimizer-HBM
    lever from docs/PERF.md round-5)."""
    import jax
    import jax.numpy as jnp
    import optax

    from yolov7_d2_tpu.config import get_cfg
    from yolov7_d2_tpu.train.optimizer import adamw_with_groups

    cfg = get_cfg()
    cfg.SOLVER.OPTIMIZER = "adamw"
    cfg.SOLVER.ADAM_BF16_STATE = True
    params = {"w": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = adamw_with_groups(lambda step: 1e-3, cfg)(params)
    state = tx.init(params)

    def find_adam_states(s, out):
        if hasattr(s, "mu") and hasattr(s, "nu"):
            out.append(s)
        elif isinstance(s, (tuple, list)):
            for child in s:
                find_adam_states(child, out)
        return out

    adam_states = find_adam_states(state, [])
    assert adam_states, "no scale_by_adam state found"
    for s in adam_states:
        for leaf in jax.tree_util.tree_leaves(s.mu):
            assert leaf.dtype == jnp.bfloat16, leaf.dtype
        for leaf in jax.tree_util.tree_leaves(s.nu):
            assert leaf.dtype == jnp.float32, leaf.dtype

    # updates still apply and carry the params' dtype
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates):
        assert leaf.dtype == jnp.float32
