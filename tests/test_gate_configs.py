"""BASELINE.json gate configs, exercised end to end on CPU:

1. dense MLP-VAE on log-mel fbank frames, single utterance, batch 1
2. conv encoder/decoder VAE on spectrogram patches, fixed-length batches
3. GRU sequence VAE over variable-length utterances with length masking
4. multi-level VAE with grouped latents (utterance + frame) and group-ELBO

(Gate 5, the full recipe incl. data parallel, lives in test_end_to_end.py
and test_data_parallel.py.)  Each gate trains a few steps and asserts the
negative ELBO actually decreases — the same "does the ELBO optimize"
check BASELINE.md gates on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mlvae_tpu.modules.conv_vae import ConvVAE
from mlvae_tpu.modules.grouped_vae import GroupedLatentVAE, group_elbo
from mlvae_tpu.modules.vanilla_vae import VanillaVAE
from mlvae_tpu.nn.rnn import GRU
from mlvae_tpu.nn.layers import Linear
from mlvae_tpu.utils.tensor import apply_lens_to_loss


def _train(loss_fn, params, steps=30, lr=1e-2):
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, rng)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for i in range(steps):
        params, state, loss = step(params, state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses


def test_gate1_dense_mlp_vae_single_utterance():
    """80-dim log-mel frames of ONE utterance, batch 1."""
    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(1, 50, 80) * 0.3, jnp.float32)

    vae = VanillaVAE(fc_sizes=[80, 32, 32], latent_size=8)
    head = Linear(8, 80)
    params = {"vae": vae.init(jax.random.PRNGKey(0)),
              "head": head.init(jax.random.PRNGKey(1))}

    def loss_fn(params, rng):
        out = vae.apply(params["vae"], feats, rng=rng)
        recon = head.apply(params["head"], out["sampled_h"])
        return jnp.mean((recon - feats) ** 2) + 1e-3 * jnp.mean(out["loss"])

    losses = _train(loss_fn, params)
    assert losses[-1] < losses[0] * 0.9, losses


def test_gate2_conv_vae_fixed_length_patches():
    rs = np.random.RandomState(1)
    patches = jnp.asarray(rs.randn(8, 16, 40) * 0.3, jnp.float32)

    vae = ConvVAE(patch_shape=(16, 40), latent_size=16, channels=(8, 16))
    params = vae.init(jax.random.PRNGKey(0))

    # shape contract
    out = vae.apply(params, patches, rng=jax.random.PRNGKey(0))
    assert out["recon"].shape == patches.shape
    assert out["mean"].shape == (8, 16)

    def loss_fn(params, rng):
        out = vae.apply(params, patches, rng=rng)
        return (jnp.mean(out["recon_loss"])
                + 1e-3 * jnp.mean(out["loss"]))

    losses = _train(loss_fn, params)
    assert losses[-1] < losses[0] * 0.9, losses


def test_gate3_gru_seq_vae_variable_lengths():
    """GRU encoder -> per-frame latent -> GRU decoder, masked ELBO over a
    variable-length padded batch."""
    rs = np.random.RandomState(2)
    B, T, C, H, LAT = 4, 24, 20, 32, 8
    feats = jnp.asarray(rs.randn(B, T, C) * 0.3, jnp.float32)
    lens = jnp.asarray([1.0, 0.9, 0.75, 0.5], jnp.float32)

    enc = GRU(C, H, num_layers=1, batch_first=True)
    dec = GRU(LAT, H, num_layers=1, batch_first=True, bidirectional=True)
    heads = {"mean": Linear(H, LAT), "log_var": Linear(H, LAT),
             "out": Linear(2 * H, C)}
    params = {
        "enc": enc.init(jax.random.PRNGKey(0)),
        "dec": dec.init(jax.random.PRNGKey(1)),
        **{k: m.init(jax.random.fold_in(jax.random.PRNGKey(2), i))
           for i, (k, m) in enumerate(heads.items())},
    }

    def loss_fn(params, rng):
        from mlvae_tpu.nn import dist as D
        h, _ = enc.apply(params["enc"], feats)
        mean = heads["mean"].apply(params["mean"], h)
        log_var = heads["log_var"].apply(params["log_var"], h)
        z = D.reparameterize(rng, mean, log_var)
        dh, _ = dec.apply(params["dec"], z)
        recon = heads["out"].apply(params["out"], dh)
        # reference masking convention: per-element losses -> masked mean
        recon_l = apply_lens_to_loss((recon - feats) ** 2, lens)
        kld_l = apply_lens_to_loss(D.kld_std_normal(mean, log_var), lens)
        return recon_l + 1e-3 * kld_l

    losses = _train(loss_fn, params)
    assert losses[-1] < losses[0] * 0.9, losses


def test_gate3_gru_matches_torch():
    """GRU weight-layout/gate-order parity vs torch.nn.GRU."""
    torch = pytest.importorskip("torch")
    B, T, C, H = 3, 7, 5, 6
    rs = np.random.RandomState(3)
    x = rs.randn(B, T, C).astype(np.float32)

    gru = GRU(C, H, num_layers=2, batch_first=True, bidirectional=True)
    params = gru.init(jax.random.PRNGKey(0))

    tg = torch.nn.GRU(C, H, num_layers=2, batch_first=True,
                      bidirectional=True)
    with torch.no_grad():
        for name, p in tg.named_parameters():
            p.copy_(torch.from_numpy(np.array(params[name])))

    ours, h_n = gru.apply(params, jnp.asarray(x))
    theirs, th_n = tg(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), th_n.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gate4_grouped_latent_vae_group_elbo():
    rs = np.random.RandomState(4)
    B, T, C = 6, 20, 24
    feats = jnp.asarray(rs.randn(B, T, C) * 0.3, jnp.float32)
    lens = jnp.asarray([1.0, 1.0, 0.8, 0.7, 0.6, 0.5], jnp.float32)

    vae = GroupedLatentVAE(fc_sizes=[C, 32, 32], frame_latent_size=6,
                           utt_latent_size=4, dec_fc_sizes=[32, C])
    params = vae.init(jax.random.PRNGKey(0))

    out = vae.apply(params, feats, lens, rng=jax.random.PRNGKey(0))
    assert out["utt_mean"].shape == (B, 4)          # one per utterance
    assert out["frame_mean"].shape == (B, T, 6)     # one per frame
    assert out["recon"].shape == feats.shape

    # padding invariance: changing padded frames must not move the
    # utterance posterior (masked pooling)
    feats2 = feats.at[-1, 15:, :].set(99.0)  # sample 5 has len 10
    out2 = vae.apply(params, feats2, lens, rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["utt_mean"][-1]),
                               np.asarray(out2["utt_mean"][-1]), rtol=1e-6)

    def loss_fn(params, rng):
        out = vae.apply(params, feats, lens, rng=rng)
        return group_elbo(out, feats, lens, kld_weight=1e-3)

    losses = _train(loss_fn, params)
    assert losses[-1] < losses[0] * 0.9, losses
