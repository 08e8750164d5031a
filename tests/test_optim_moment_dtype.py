"""MLVAE_OPT_MOMENT_DTYPE: Adam with both moments stored in a reduced
dtype (training/optim.py) — the single-chip companion to ZeRO-1 for
cutting w2v-scale optimizer residency (PERF.md round-5 ledger)."""
import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.training.optim import Adam, set_learning_rate, \
    get_learning_rate


def _params():
    k = jax.random.PRNGKey(0)
    return {"w": jax.random.normal(k, (8, 16)) * 0.1,
            "b": jnp.zeros((16,))}


def _grads(i):
    k = jax.random.PRNGKey(100 + i)
    return {"w": jax.random.normal(k, (8, 16)) * 0.01,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (16,)) * 0.01}


def _run(moment_dtype, steps=5):
    factory = Adam(lr=1e-3)
    if moment_dtype is not None:
        factory.kwargs["moment_dtype"] = moment_dtype
    opt = factory.make()
    params = _params()
    state = opt.init(params)
    for i in range(steps):
        updates, state = opt.update(_grads(i), state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, state


def test_f32_moment_dtype_matches_stock_adam():
    p_ref, _ = _run(None)
    p_f32, _ = _run("float32")  # falls through to stock optax.adam
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_f32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_moments_halve_state_and_track_f32():
    p_ref, _ = _run(None)
    p_bf, state = _run("bfloat16")
    # moments really stored in bf16
    inner = state.inner_state if hasattr(state, "inner_state") else state
    adam_state = jax.tree_util.tree_leaves(
        [s for s in jax.tree_util.tree_leaves(
            inner, is_leaf=lambda x: hasattr(x, "mu")) if hasattr(s, "mu")][0].mu)
    assert all(a.dtype == jnp.bfloat16 for a in adam_state)
    # trajectory tracks the f32 run (bf16 moments perturb, not derail)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_bf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-4)


def test_lr_poking_still_works_with_moment_dtype():
    factory = Adam(lr=1e-3)
    factory.kwargs["moment_dtype"] = "bfloat16"
    opt = factory.make()
    state = opt.init(_params())
    st = {"m": state}
    set_learning_rate(st, 5e-4)
    assert abs(get_learning_rate(st) - 5e-4) < 1e-12
