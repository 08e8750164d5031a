"""Interpret-mode parity for the experimental K-unrolled forward kernels
(``ops/lstm_unroll_exp.py``) against the production kernels — values must
be bit-identical (same gate math, same carry precision, only the grid
shape differs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvae_tpu.ops import lstm_pallas as lp
from mlvae_tpu.ops import lstm_unroll_exp as lu

B, T, H, IN = 8, 12, 128, 128


def _data(dtype):
    rs = np.random.RandomState(0)
    gx = jnp.asarray(rs.randn(T, B, 4 * H).astype(np.float32), dtype)
    x = jnp.asarray(rs.randn(T, B, IN).astype(np.float32), dtype)
    w_ih = jnp.asarray(rs.randn(4 * H, IN).astype(np.float32) * 0.05, dtype)
    w_hh = jnp.asarray(rs.randn(4 * H, H).astype(np.float32) * 0.05, dtype)
    bias = jnp.asarray(rs.randn(4 * H).astype(np.float32) * 0.05)
    return gx, x, w_ih, w_hh, bias


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("K", [2, 4])
def test_plain_fwd_unrolled_bitexact(dtype, reverse, K):
    gx, _, _, w_hh, _ = _data(dtype)
    hs0, cs0 = lp._run_fwd(gx, w_hh, reverse, interpret=True)
    hs1, cs1 = lu.run_fwd_k(gx, w_hh, reverse, K=K, interpret=True)
    assert hs0.dtype == hs1.dtype
    np.testing.assert_array_equal(np.asarray(hs0, np.float32),
                                  np.asarray(hs1, np.float32))
    np.testing.assert_array_equal(np.asarray(cs0), np.asarray(cs1))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("reverse", [False, True])
def test_fused_fwd_unrolled_bitexact(dtype, reverse):
    _, x, w_ih, w_hh, bias = _data(dtype)
    hs0, cs0 = lp._run_fwd_fused(x, w_ih, bias, w_hh, reverse,
                                 interpret=True)
    hs1, cs1 = lu.run_fwd_fused_k(x, w_ih, bias, w_hh, reverse, K=2,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(hs0, np.float32),
                                  np.asarray(hs1, np.float32))
    np.testing.assert_array_equal(np.asarray(cs0), np.asarray(cs1))
