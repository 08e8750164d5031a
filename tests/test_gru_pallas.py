"""Pallas GRU kernel parity vs the scan recurrence (interpret mode on
CPU; same structure as test_lstm_pallas.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvae_tpu.ops.gru_pallas import gru_layer


def _scan_gru(gates_x, w_hh, b_hh, reverse=False):
    T, B, G = gates_x.shape
    H = G // 3
    w_hh_t = w_hh.T

    def step(h, gx):
        gh = h @ w_hh_t + b_hh
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    _, hs = jax.lax.scan(step, jnp.zeros((B, H)), gates_x, reverse=reverse)
    return hs


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_gru_forward_matches_scan(reverse):
    rs = np.random.RandomState(0)
    gx = jnp.asarray(rs.randn(14, 8, 48) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(48, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(48) * 0.1, jnp.float32)
    hs_p = gru_layer(gx, w, b, reverse, True)
    hs_s = _scan_gru(gx, w, b, reverse)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_gru_gradients_match_scan(reverse):
    rs = np.random.RandomState(1)
    gx = jnp.asarray(rs.randn(10, 8, 48) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(48, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(48) * 0.1, jnp.float32)

    gp = jax.grad(
        lambda g, ww, bb: jnp.sum(gru_layer(g, ww, bb, reverse, True) ** 2),
        argnums=(0, 1, 2))(gx, w, b)
    gs = jax.grad(
        lambda g, ww, bb: jnp.sum(_scan_gru(g, ww, bb, reverse) ** 2),
        argnums=(0, 1, 2))(gx, w, b)
    for a, b_ in zip(gp, gs):
        rel = float(jnp.abs(a - b_).max()
                    / jnp.maximum(jnp.abs(b_).max(), 1e-8))
        assert rel < 1e-5, rel


def test_pallas_gru_bf16_streams():
    rs = np.random.RandomState(2)
    gx32 = jnp.asarray(rs.randn(12, 16, 48) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(48, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(48) * 0.1, jnp.float32)
    gx16, w16 = gx32.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    hs_p = gru_layer(gx16, w16, b, False, True)
    assert hs_p.dtype == jnp.bfloat16
    hs_s = _scan_gru(gx32, w, b)
    err = float(jnp.abs(hs_p.astype(jnp.float32) - hs_s).max())
    assert err < 0.03, err


def test_sharded_pallas_gru_matches_scan():
    from mlvae_tpu.ops.gru_pallas import sharded_gru_layer
    from mlvae_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    f = sharded_gru_layer(mesh, "data")
    rs = np.random.RandomState(5)
    gx = jnp.asarray(rs.randn(10, 16, 48) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(48, 16) * 0.1, jnp.float32)
    b = jnp.asarray(rs.randn(48) * 0.1, jnp.float32)

    hs_p = jax.jit(lambda g, ww, bb: f(g, ww, bb, False, True))(gx, w, b)
    hs_s = _scan_gru(gx, w, b)
    np.testing.assert_allclose(np.asarray(hs_p), np.asarray(hs_s),
                               rtol=1e-5, atol=1e-6)

    gp = jax.jit(jax.grad(
        lambda g, ww, bb: jnp.sum(f(g, ww, bb, False, True) ** 2),
        argnums=(0, 1, 2)))(gx, w, b)
    gs = jax.grad(
        lambda g, ww, bb: jnp.sum(_scan_gru(g, ww, bb) ** 2),
        argnums=(0, 1, 2))(gx, w, b)
    for a, b_ in zip(gp, gs):
        rel = float(jnp.abs(a - b_).max()
                    / jnp.maximum(jnp.abs(b_).max(), 1e-8))
        assert rel < 1e-5, rel


def test_pallas_gru_bf16_backward_uses_f32_carry():
    """Under AMP the backward must reconstruct the elementwise dh chain
    from the EXACT f32 carry trajectory (saved as a second forward output),
    not the bf16-rounded hs — mirroring the LSTM kernel's f32 cs design.
    The gradient w.r.t. an upstream sum must track the 'AMP-exact' oracle
    (f32 carry, bf16 dots) far tighter than the bf16-carry drift bound."""
    rs = np.random.RandomState(7)
    T, B, H = 40, 16, 16
    gx32 = jnp.asarray(rs.randn(T, B, 3 * H) * 0.5, jnp.float32)
    w = jnp.asarray(rs.randn(3 * H, H) * 0.3, jnp.float32)
    b = jnp.asarray(rs.randn(3 * H) * 0.1, jnp.float32)
    w16 = w.astype(jnp.bfloat16)

    def amp_exact_scan(gx, ww, bb):
        """Oracle: f32 carry, dots through bf16 casts exactly as the kernel
        runs them; autodiff gives the exact AMP gradients."""
        H_ = ww.shape[1]

        def step(h, gx_t):
            gh = (h.astype(jnp.bfloat16) @ ww.astype(jnp.bfloat16).T
                  ).astype(jnp.float32) + bb
            r = jax.nn.sigmoid(gx_t[:, :H_].astype(jnp.float32)
                               + gh[:, :H_])
            z = jax.nn.sigmoid(gx_t[:, H_:2 * H_].astype(jnp.float32)
                               + gh[:, H_:2 * H_])
            n = jnp.tanh(gx_t[:, 2 * H_:].astype(jnp.float32)
                         + r * gh[:, 2 * H_:])
            h = (1.0 - z) * n + z * h
            return h, h

        _, hs = jax.lax.scan(step, jnp.zeros((gx.shape[1], H_)), gx)
        return hs

    def loss_pallas(gx, ww):
        return jnp.sum(gru_layer(gx.astype(jnp.bfloat16), ww, b, False,
                                 True).astype(jnp.float32) ** 2)

    def loss_oracle(gx, ww):
        return jnp.sum(amp_exact_scan(gx.astype(jnp.bfloat16), ww, b) ** 2)

    g_p = jax.grad(loss_pallas, argnums=1)(gx32, w16).astype(jnp.float32)
    g_o = jax.grad(loss_oracle, argnums=1)(gx32, w16).astype(jnp.float32)
    rel = float(jnp.abs(g_p - g_o).max() / (jnp.abs(g_o).max() + 1e-9))
    # bf16 output cotangents round at ~4e-3; the dh CHAIN itself is exact
    assert rel < 0.02, rel
