"""L3 module tests: shapes, contracts, and numpy/torch oracles for the loss
math (independent reimplementations of the reference formulas, not copies).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch

from mlvae_tpu.modules.fc_block import FCBlock
from mlvae_tpu.modules.vanilla_vae import VanillaVAE
from mlvae_tpu.modules.gmm_vae import GMMVAE
from mlvae_tpu.modules.h_vae import HierarchicalVAE
from mlvae_tpu.modules.decoder import Decoder
from mlvae_tpu.modules.boundary_detector import BoundaryDetector
from mlvae_tpu.modules.phoneme_recognizer import PhonemeRecognizer
from mlvae_tpu.utils.tensor import (
    apply_weight,
    apply_lens_to_loss,
    boundary_to_phoneme_index,
)
from mlvae_tpu.nn.norm import InputNormalization

K = jax.random.PRNGKey


def test_fcblock_matches_torch_stack():
    sizes = [10, 16, 16, 4]
    blk = FCBlock(sizes, end_activation=True)
    params = blk.init(K(0))
    x = np.random.RandomState(0).randn(3, 5, 10).astype(np.float32)
    y = blk.apply(params, jnp.asarray(x))

    layers = []
    for i in range(len(sizes) - 1):
        lin = torch.nn.Linear(sizes[i], sizes[i + 1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.array(params[f"lin{i}"]["weight"])))
            lin.bias.copy_(torch.from_numpy(np.array(params[f"lin{i}"]["bias"])))
        layers += [lin, torch.nn.LeakyReLU()]
    tmod = torch.nn.Sequential(*layers)
    with torch.no_grad():
        ty = tmod(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-5, atol=1e-6)


def test_vanilla_vae_contract():
    vae = VanillaVAE([12, 8, 8], latent_size=4)
    params = vae.init(K(1))
    x = jax.random.normal(K(2), (2, 6, 12))
    out = vae.apply(params, x, rng=K(3))
    assert set(out) == {"mean", "log_var", "sampled_h", "loss"}
    assert out["mean"].shape == (2, 6, 4)
    expected = -0.5 * (
        1 + out["log_var"] - out["mean"] ** 2 - jnp.exp(out["log_var"])
    )
    np.testing.assert_allclose(
        np.asarray(out["loss"]), np.asarray(expected), rtol=1e-5, atol=1e-6
    )


def test_gmm_vae_contract():
    vae = GMMVAE([12, 8, 8], latent_size=4, num_components=3)
    params = vae.init(K(1))
    x = jax.random.normal(K(2), (2, 6, 12))
    out = vae.apply(params, x, rng=K(3))
    assert out["mean"].shape == (2, 6, 12)  # N*C = 3*4
    assert out["gmm_weight"].shape == (2, 6, 3)
    w = np.asarray(out["gmm_weight"])
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-6)  # hard one-hot
    # eps-regularized learned-prior KLD formula
    eps = 1e-5
    pm, plv = np.asarray(out["prior_mean"]), np.asarray(out["prior_log_var"])
    m, lv = np.asarray(out["mean"]), np.asarray(out["log_var"])
    expected = -0.5 * (1 + lv - plv - (np.exp(lv) + (m - pm) ** 2) / (np.exp(plv) + eps))
    np.testing.assert_allclose(np.asarray(out["loss"]), expected, rtol=1e-4, atol=1e-5)


def test_apply_weight_matches_torch_bmm():
    rs = np.random.RandomState(0)
    B, T, N, C = 2, 5, 3, 4
    x4 = rs.randn(B, T, N, C).astype(np.float32)
    w = rs.rand(B, T, N).astype(np.float32)
    ours4 = np.asarray(apply_weight(jnp.asarray(x4), jnp.asarray(w)))
    tx = torch.from_numpy(x4).reshape(B * T, N, C)
    tw = torch.from_numpy(w).reshape(B * T, 1, N)
    theirs = torch.bmm(tw, tx).reshape(B, T, C).numpy()
    np.testing.assert_allclose(ours4, theirs, rtol=1e-5, atol=1e-6)
    # flattened (B, T, N*C) input variant
    ours3 = np.asarray(apply_weight(jnp.asarray(x4.reshape(B, T, N * C)), jnp.asarray(w)))
    np.testing.assert_allclose(ours3, theirs, rtol=1e-5, atol=1e-6)


def test_h_vae_mixing_is_linear_in_pi():
    hv = HierarchicalVAE([12, 8, 8], latent_size=4, num_components=3)
    params = hv.init(K(1))
    x = jax.random.normal(K(2), (2, 6, 12))

    def run(pi_vals):
        pi = jnp.broadcast_to(jnp.asarray(pi_vals, jnp.float32), (2, 6, 2))
        return hv.apply(params, x, pi, rng=K(3))

    out10 = run([1.0, 0.0])
    out01 = run([0.0, 1.0])
    outmix = run([0.5, 0.5])
    for key in ["mean", "sampled_h"]:
        np.testing.assert_allclose(
            np.asarray(outmix[key]),
            0.5 * (np.asarray(out10[key]) + np.asarray(out01[key])),
            rtol=1e-4, atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(outmix["losses"]["vae_kld_loss"]),
        0.5 * (np.asarray(out10["losses"]["vae_kld_loss"])
               + np.asarray(out01["losses"]["vae_kld_loss"])),
        rtol=1e-4, atol=1e-5,
    )


def test_decoder_likelihood_loss():
    dec = Decoder(input_size=4, rnn_hidden_size=6, rnn_num_layers=2,
                  rnn_dropout=0.0, fc_sizes=[12, 8, 5])
    params = dec.init(K(0))
    h = jax.random.normal(K(1), (2, 7, 4))
    target = jax.random.normal(K(2), (2, 7, 5))
    out = dec.apply(params, h, target)
    eps = 1e-5
    m, lv = np.asarray(out["mean"]), np.asarray(out["log_var"])
    t = np.asarray(target)
    ll = -0.5 * (np.log(2 * np.pi) + lv + (t - m) ** 2 / (np.exp(lv) + eps))
    np.testing.assert_allclose(
        np.asarray(out["losses"]["recon_loss"]), -ll, rtol=1e-4, atol=1e-5
    )


def test_decoder_mse_loss():
    dec = Decoder(4, 6, 1, 0.0, [12, 5], loss_type="mse")
    params = dec.init(K(0))
    h = jax.random.normal(K(1), (1, 3, 4))
    target = jax.random.normal(K(2), (1, 3, 5))
    out = dec.apply(params, h, target)
    m = np.asarray(out["mean"])
    np.testing.assert_allclose(
        np.asarray(out["losses"]["recon_loss"]),
        (np.asarray(target) - m) ** 2,
        rtol=1e-5, atol=1e-6,
    )


def test_boundary_detector_contract():
    bd = BoundaryDetector(input_size=12, rnn_hidden_size=8,
                          rnn_num_layers=1, fc_sizes=[8, 4, 1])
    params = bd.init(K(0))
    x = jax.random.normal(K(1), (2, 9, 12))
    feat_lens = jnp.asarray([1.0, 0.7])
    bnd = jnp.zeros((2, 9)).at[:, 0].set(1).at[0, 4].set(1)
    out = bd.apply(params, x, feat_lens, bnd, rng=K(2))
    v = np.asarray(out["boundary_v"])
    assert v.shape == (2, 9)
    assert (v > 0).all() and (v < 1).all()
    assert out["losses"]["boundary_bce_loss"].shape == (2, 9)
    assert out["losses"]["boundary_kld_loss"].shape == (2, 9)
    assert np.isfinite(np.asarray(out["losses"]["boundary_kld_loss"])).all()


def _ref_phn_recog_loss(out, feat_lens, plvl, plvl_lens, boundary):
    """Independent numpy oracle implementing the reference's per-sample
    duration-expansion loss (``phoneme_recognizer.py:35-81``)."""
    B, T, N = out.shape
    loss = np.zeros_like(out)
    for i in range(B):
        T_i = int(np.round(feat_lens[i] * T))
        L_i = int(np.round(plvl_lens[i] * plvl.shape[1]))
        b = boundary[i, :T_i]
        starts = np.where(b == 1)[0].tolist() + [T_i]
        durations = np.diff(starts)
        y_rows = np.repeat(plvl[i, :L_i], durations)
        y = np.eye(N, dtype=np.float32)[y_rows]
        o = out[i, :T_i]
        l = np.maximum(o, 0) - o * y + np.log1p(np.exp(-np.abs(o)))
        loss[i, :T_i] = l
    return loss


def test_phoneme_recognizer_loss_matches_reference_algorithm():
    n_phonemes = 5
    pr = PhonemeRecognizer(input_size=6, rnn_hidden_size=8, rnn_num_layers=1,
                           fc_sizes=[8, 7], n_phonemes=n_phonemes)
    params = pr.init(K(0))
    B, T, L = 3, 12, 4
    feats = jax.random.normal(K(1), (B, T, 6))
    feat_lens = jnp.asarray([1.0, 10 / 12, 8 / 12])
    plvl = jnp.asarray([[1, 2, 3, 4], [2, 5, 0, 0], [6, 1, 0, 0]])
    plvl_lens = jnp.asarray([1.0, 0.5, 0.5])
    boundary = np.zeros((B, T), np.float32)
    boundary[0, [0, 3, 6, 9]] = 1
    boundary[1, [0, 5]] = 1
    boundary[2, [0, 4]] = 1
    out = pr.apply(params, feats, feat_lens, plvl, plvl_lens,
                   jnp.asarray(boundary))
    loss = np.asarray(out["losses"]["phn_recog_bce_loss"])
    oracle = _ref_phn_recog_loss(
        np.asarray(out["out"]), np.asarray(feat_lens), np.asarray(plvl),
        np.asarray(plvl_lens), boundary,
    )
    np.testing.assert_allclose(loss, oracle, rtol=1e-5, atol=1e-6)


def test_apply_lens_to_loss_reductions():
    rs = np.random.RandomState(0)
    loss = rs.rand(2, 10, 3).astype(np.float32)
    lens = np.asarray([1.0, 0.5], np.float32)
    mask = np.zeros((2, 10, 3), np.float32)
    mask[0, :10] = 1
    mask[1, :5] = 1
    expect_mean = (loss * mask).sum() / mask.sum()
    got = apply_lens_to_loss(jnp.asarray(loss), jnp.asarray(lens))
    np.testing.assert_allclose(float(got), expect_mean, rtol=1e-6)
    got_b = apply_lens_to_loss(jnp.asarray(loss), jnp.asarray(lens), "batch")
    expect_b = (loss * mask).reshape(2, -1).sum(-1) / mask.reshape(2, -1).sum(-1)
    np.testing.assert_allclose(np.asarray(got_b), expect_b, rtol=1e-6)


def test_input_normalization_global():
    norm = InputNormalization(norm_type="global")
    state = norm.init_state(4)
    x = jax.random.normal(K(0), (3, 8, 4)) * 3.0 + 5.0
    lens = jnp.ones((3,))
    out, state = norm.apply(state, x, lens, epoch=1, update=True)
    assert float(state["count"]) == 3.0
    # After the first update, stats should be near the batch stats.
    assert abs(np.asarray(state["glob_mean"]).mean() - 5.0) < 0.5
    # normalized output roughly zero-mean unit-var
    assert abs(np.asarray(out).mean()) < 0.3
    # eval: no update
    out2, state2 = norm.apply(state, x, lens, epoch=10, update=False)
    assert float(state2["count"]) == 3.0


def test_boundary_to_phoneme_index():
    b = jnp.asarray([[1, 0, 0, 1, 0, 1, 0]])
    idx = np.asarray(boundary_to_phoneme_index(b))
    np.testing.assert_array_equal(idx[0], [0, 0, 0, 1, 1, 2, 2])
