"""NN core tests: layers vs torch semantics, LSTM state-dict parity vs torch.

torch (CPU) is available in the image as an independent oracle; we copy our
randomly-initialized params into a torch module and require outputs to agree.
This validates the gate order, layouts, activation and dropout semantics the
reference relies on, without ever running torch in the framework itself.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from mlvae_tpu.nn.layers import Linear, leaky_relu
from mlvae_tpu.nn.rnn import LSTM


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    lin = Linear(12, 7)
    params = lin.init(key)
    x = np.random.RandomState(0).randn(4, 5, 12).astype(np.float32)

    y = lin.apply(params, jnp.asarray(x))

    tlin = torch.nn.Linear(12, 7)
    with torch.no_grad():
        tlin.weight.copy_(torch.from_numpy(np.array(params["weight"])))
        tlin.bias.copy_(torch.from_numpy(np.array(params["bias"])))
        ty = tlin(torch.from_numpy(x))

    np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-5, atol=1e-5)


def test_leaky_relu_matches_torch():
    x = np.random.RandomState(1).randn(100).astype(np.float32)
    ours = leaky_relu(jnp.asarray(x))
    theirs = torch.nn.functional.leaky_relu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_matches_torch(bidirectional, num_layers):
    B, T, C, H = 3, 11, 6, 8
    lstm = LSTM(C, H, num_layers=num_layers, batch_first=True,
                bidirectional=bidirectional)
    params = lstm.init(jax.random.PRNGKey(42))
    x = np.random.RandomState(2).randn(B, T, C).astype(np.float32)

    out, _ = lstm.apply(params, jnp.asarray(x))

    tl = torch.nn.LSTM(C, H, num_layers=num_layers, batch_first=True,
                       bidirectional=bidirectional)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in params.items()}
    tl.load_state_dict(sd)
    with torch.no_grad():
        tout, _ = tl(torch.from_numpy(x))

    np.testing.assert_allclose(
        np.asarray(out), tout.numpy(), rtol=2e-4, atol=2e-5
    )


def test_lstm_dropout_train_changes_output_eval_deterministic():
    lstm = LSTM(4, 8, num_layers=2, dropout=0.5)
    params = lstm.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 5, 4))
    out_eval1, _ = lstm.apply(params, x, train=False)
    out_eval2, _ = lstm.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))
    out_tr, _ = lstm.apply(params, x, rng=jax.random.PRNGKey(1), train=True)
    assert not np.allclose(np.asarray(out_tr), np.asarray(out_eval1))


def test_lstm_hn_cn_match_torch():
    """h_n AND c_n (real cell state) match torch for uni/bi layers."""
    B, T, C, H = 3, 9, 6, 8
    for bidirectional in (False, True):
        lstm = LSTM(C, H, num_layers=2, batch_first=True,
                    bidirectional=bidirectional)
        params = lstm.init(jax.random.PRNGKey(5))
        x = np.random.RandomState(6).randn(B, T, C).astype(np.float32)
        _, (h_n, c_n) = lstm.apply(params, jnp.asarray(x))
        tl = torch.nn.LSTM(C, H, num_layers=2, batch_first=True,
                           bidirectional=bidirectional)
        tl.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in params.items()})
        with torch.no_grad():
            _, (th, tc) = tl(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(h_n), th.numpy(),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(c_n), tc.numpy(),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("cls_name", ["LSTM", "GRU"])
def test_rnn_bias_false_matches_torch(cls_name):
    """torch constructor parity for bias=False: no bias params are created
    or added (previously the flag was stored but silently ignored)."""
    from mlvae_tpu.nn.rnn import GRU
    B, T, C, H = 2, 7, 5, 8
    cls = LSTM if cls_name == "LSTM" else GRU
    tcls = torch.nn.LSTM if cls_name == "LSTM" else torch.nn.GRU
    rnn = cls(C, H, num_layers=2, batch_first=True, bidirectional=True,
              bias=False)
    params = rnn.init(jax.random.PRNGKey(3))
    assert not any(k.startswith("bias") for k in params)
    x = np.random.RandomState(4).randn(B, T, C).astype(np.float32)
    out = rnn.apply(params, jnp.asarray(x))[0]

    tl = tcls(C, H, num_layers=2, batch_first=True, bidirectional=True,
              bias=False)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in params.items()}
    tl.load_state_dict(sd)
    with torch.no_grad():
        tout = tl(torch.from_numpy(x))[0]
    np.testing.assert_allclose(np.asarray(out), tout.numpy(),
                               rtol=2e-4, atol=2e-5)
