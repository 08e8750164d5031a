"""Sharded Pallas LSTM (shard_map over the data axis) parity vs the scan
recurrence — interpret mode on the 8-device CPU mesh.

Validates the DP path of the kernel: per-shard recurrence launches and the
psum'd dW_hh accumulator must reproduce the single-device math exactly
(reference replaces cuDNN LSTMs, SURVEY §2.6; the DP design is batch
sharding + grad psum over ICI).
"""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from mlvae_tpu.ops.lstm_pallas import sharded_lstm_layer
from mlvae_tpu.parallel.mesh import make_mesh


def _scan_lstm(gates_x, w_hh, reverse=False):
    T, B, G = gates_x.shape
    H = G // 4
    w_hh_t = w_hh.T

    def step(carry, gx):
        h, c = carry
        gates = gx + h @ w_hh_t
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (_, c_last), hs = jax.lax.scan(
        step, (jnp.zeros((B, H)), jnp.zeros((B, H))), gates_x,
        reverse=reverse,
    )
    return hs, c_last


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_pallas_lstm_matches_scan(reverse):
    mesh = make_mesh(8)
    f = sharded_lstm_layer(mesh, "data")
    rs = np.random.RandomState(3)
    # B=16 -> per-shard batch of 2 on the 8-device mesh
    gx = jnp.asarray(rs.randn(12, 16, 64) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(64, 16) * 0.1, jnp.float32)

    hs_p, cl_p = jax.jit(
        lambda g, ww: f(g, ww, reverse, True)
    )(gx, w)
    hs_s, cl_s = _scan_lstm(gx, w, reverse)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cl_p), np.asarray(cl_s),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_pallas_lstm_gradients(reverse):
    mesh = make_mesh(8)
    f = sharded_lstm_layer(mesh, "data")
    rs = np.random.RandomState(4)
    gx = jnp.asarray(rs.randn(10, 16, 64) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(64, 16) * 0.1, jnp.float32)

    def loss_p(g, ww):
        hs, cl = f(g, ww, reverse, True)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    def loss_s(g, ww):
        hs, cl = _scan_lstm(g, ww, reverse)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(gx, w)
    gs = jax.grad(loss_s, argnums=(0, 1))(gx, w)
    for a, b in zip(gp, gs):
        rel = float(jnp.abs(a - b).max()
                    / jnp.maximum(jnp.abs(b).max(), 1e-8))
        assert rel < 1e-5, rel


def _ref_fused(x, w_ih, bias, w_hh, reverse=False):
    gx = jnp.einsum("tbc,gc->tbg", x, w_ih,
                    preferred_element_type=jnp.float32) + bias
    return _scan_lstm(gx, w_hh, reverse)


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_fused_lstm_matches_reference(reverse):
    """Fused-projection kernel under the DP mesh: per-shard launches with
    psum'd dW_ih / db / dW_hh must reproduce single-device autodiff."""
    from mlvae_tpu.ops.lstm_pallas import sharded_lstm_layer_fused

    mesh = make_mesh(8)
    f = sharded_lstm_layer_fused(mesh, "data")
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(10, 16, 32) * 0.5, jnp.float32)
    w_ih = jnp.asarray(rs.randn(64, 32) * 0.1, jnp.float32)
    bias = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rs.randn(64, 16) * 0.1, jnp.float32)

    hs_p, cl_p = jax.jit(lambda *a: f(*a, reverse, True))(x, w_ih, bias, w_hh)
    hs_s, cl_s = _ref_fused(x, w_ih, bias, w_hh, reverse)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cl_p), np.asarray(cl_s),
                               rtol=1e-5, atol=1e-6)

    def loss_p(*a):
        hs, cl = f(*a, reverse, True)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    def loss_s(*a):
        hs, cl = _ref_fused(*a, reverse)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(x, w_ih, bias, w_hh)
    gs = jax.grad(loss_s, argnums=(0, 1, 2, 3))(x, w_ih, bias, w_hh)
    for name, a, b in zip(("dx", "dw_ih", "db", "dw_hh"), gp, gs):
        rel = float(jnp.abs(a - b).max()
                    / jnp.maximum(jnp.abs(b).max(), 1e-8))
        assert rel < 1e-5, (name, rel)


@pytest.mark.parametrize("reverse", [False, True])
def test_sharded_semifused_lstm_matches_reference(reverse):
    """Half-fused variant under the DP mesh: sharded kernels + GSPMD
    dX/dW_ih/db einsums reproduce single-device autodiff."""
    from mlvae_tpu.ops.lstm_pallas import sharded_lstm_layer_semifused

    mesh = make_mesh(8)
    f = sharded_lstm_layer_semifused(mesh, "data")
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(10, 16, 32) * 0.5, jnp.float32)
    w_ih = jnp.asarray(rs.randn(64, 32) * 0.1, jnp.float32)
    bias = jnp.asarray(rs.randn(64) * 0.1, jnp.float32)
    w_hh = jnp.asarray(rs.randn(64, 16) * 0.1, jnp.float32)

    def loss_p(*a):
        hs, cl = f(*a, reverse, True)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    def loss_s(*a):
        hs, cl = _ref_fused(*a, reverse)
        return jnp.sum(hs ** 2) + jnp.sum(jnp.sin(cl))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2, 3)))(x, w_ih, bias, w_hh)
    gs = jax.grad(loss_s, argnums=(0, 1, 2, 3))(x, w_ih, bias, w_hh)
    for name, a, b in zip(("dx", "dw_ih", "db", "dw_hh"), gp, gs):
        rel = float(jnp.abs(a - b).max()
                    / jnp.maximum(jnp.abs(b).max(), 1e-8))
        assert rel < 1e-5, (name, rel)
