"""ELBO parity gate (BASELINE.md: "ELBO curves matching within tolerance").

The PyTorch reference stack cannot run here (no speechbrain), so parity is
checked the strongest available way: an independent torch replica of the
VAE encoder/decoder is built IN THIS TEST from torch primitives, loaded
with our randomly-initialized parameters, and fed identical inputs.  With
sampling made deterministic (latent = posterior mean), the KLD and
reconstruction terms — and their GRADIENTS — must agree between torch
autograd and jax.grad.  If a full training curve diverged, this is where it
would show first.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from mlvae_tpu.modules.decoder import Decoder
from mlvae_tpu.modules.vanilla_vae import VanillaVAE
from mlvae_tpu.utils.tensor import apply_lens_to_loss

B, T, C, LATENT = 2, 12, 10, 6
FC = [C, 8, 8]
DEC_H, DEC_LAYERS = 16, 2
DEC_FC = [2 * DEC_H, 8, 8, C]


def _torch_fc_stack(sizes, params, prefix, end_activation=False):
    layers = []
    n = len(sizes) - 1
    for i in range(n):
        lin = torch.nn.Linear(sizes[i], sizes[i + 1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(
                np.array(params[f"lin{i}"]["weight"])))
            lin.bias.copy_(torch.from_numpy(
                np.array(params[f"lin{i}"]["bias"])))
        layers.append(lin)
        if i < n - 1 or end_activation:
            layers.append(torch.nn.LeakyReLU())
    return torch.nn.Sequential(*layers)


def _torch_linear(params):
    lin = torch.nn.Linear(params["weight"].shape[1], params["weight"].shape[0])
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(np.array(params["weight"])))
        lin.bias.copy_(torch.from_numpy(np.array(params["bias"])))
    return lin


class TorchVAE(torch.nn.Module):
    def __init__(self, params):
        super().__init__()
        self.fc = _torch_fc_stack(FC, params["fc"], "fc", end_activation=True)
        self.mean_fc = _torch_linear(params["mean_fc"])
        self.log_var_fc = _torch_linear(params["log_var_fc"])

    def forward(self, x):
        h = self.fc(x)
        mean = self.mean_fc(h)
        log_var = self.log_var_fc(h)
        kld = -0.5 * (1 + log_var - mean.pow(2) - log_var.exp())
        return mean, log_var, kld


class TorchDecoder(torch.nn.Module):
    def __init__(self, params):
        super().__init__()
        self.rnn = torch.nn.LSTM(LATENT, DEC_H, DEC_LAYERS, batch_first=True,
                                 bidirectional=True)
        sd = {k: torch.from_numpy(np.array(v))
              for k, v in params["rnn"].items()}
        self.rnn.load_state_dict(sd)
        self.mean_fc = _torch_fc_stack(DEC_FC, params["mean_fc"], "mean_fc")
        self.log_var_fc = _torch_fc_stack(DEC_FC, params["log_var_fc"],
                                          "log_var_fc")

    def forward(self, h, target):
        out, _ = self.rnn(h)
        mean = self.mean_fc(out)
        log_var = self.log_var_fc(out)
        eps = 1e-5
        ll = -0.5 * (torch.log(torch.tensor(2 * np.pi)) + log_var
                     + (target - mean) ** 2 / (log_var.exp() + eps))
        return -ll


@pytest.fixture(scope="module")
def setup():
    vae = VanillaVAE(FC, LATENT)
    dec = Decoder(LATENT, DEC_H, DEC_LAYERS, 0.0, DEC_FC)
    params = {
        "vae": vae.init(jax.random.PRNGKey(0)),
        "dec": dec.init(jax.random.PRNGKey(1)),
    }
    rs = np.random.RandomState(0)
    feats = rs.randn(B, T, C).astype(np.float32)
    lens = np.asarray([1.0, 0.75], np.float32)
    return vae, dec, params, feats, lens


def _jax_elbo(vae, dec, params, feats, lens):
    def elbo(p):
        out = vae.apply(p["vae"], jnp.asarray(feats),
                        rng=jax.random.PRNGKey(9))
        kld = apply_lens_to_loss(out["loss"], jnp.asarray(lens))
        dec_out = dec.apply(p["dec"], out["mean"], jnp.asarray(feats))
        recon = apply_lens_to_loss(dec_out["losses"]["recon_loss"],
                                   jnp.asarray(lens))
        return kld + recon, (kld, recon)
    return elbo


def _torch_elbo(params, feats, lens):
    tvae = TorchVAE(params["vae"])
    tdec = TorchDecoder(params["dec"])
    x = torch.from_numpy(feats)
    mean, log_var, kld_el = tvae(x)
    recon_el = tdec(mean, x)

    def masked_mean(loss):
        # unrounded fractional threshold, like reference data_utils.py:86-92
        Tm = loss.shape[1]
        mask = (torch.arange(Tm)[None, :]
                < (torch.from_numpy(lens) * Tm)[:, None])
        mask = mask[..., None].float().expand_as(loss)
        return (loss * mask).sum() / mask.sum()

    kld = masked_mean(kld_el)
    recon = masked_mean(recon_el)
    return tvae, tdec, kld, recon


def test_elbo_values_match(setup):
    vae, dec, params, feats, lens = setup
    (_, (kld_j, recon_j)) = _jax_elbo(vae, dec, params, feats, lens)(params)
    _, _, kld_t, recon_t = _torch_elbo(params, feats, lens)
    assert abs(float(kld_j) - kld_t.item()) / abs(kld_t.item()) < 1e-4
    assert abs(float(recon_j) - recon_t.item()) / abs(recon_t.item()) < 1e-3


def test_elbo_gradients_match(setup):
    vae, dec, params, feats, lens = setup
    grads = jax.grad(lambda p: _jax_elbo(vae, dec, params, feats, lens)(p)[0]
                     )(params)

    tvae, tdec, kld_t, recon_t = _torch_elbo(params, feats, lens)
    (kld_t + recon_t).backward()

    pairs = [
        (grads["vae"]["mean_fc"]["weight"], tvae.mean_fc.weight.grad),
        (grads["vae"]["fc"]["lin0"]["weight"], tvae.fc[0].weight.grad),
        (grads["dec"]["rnn"]["weight_hh_l0"],
         tdec.rnn.weight_hh_l0.grad),
        (grads["dec"]["mean_fc"]["lin0"]["weight"],
         tdec.mean_fc[0].weight.grad),
    ]
    for ours, theirs in pairs:
        ours = np.asarray(ours)
        theirs = theirs.numpy()
        denom = max(np.abs(theirs).max(), 1e-6)
        rel = np.abs(ours - theirs).max() / denom
        assert rel < 2e-3, rel
