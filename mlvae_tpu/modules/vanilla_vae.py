"""Vanilla VAE branch (the "correct pronunciation" prior).

Parity with reference ``modules/vanilla_vae.py``: FC trunk (ending in an
extra LeakyReLU) -> mean/log-var heads -> reparameterized sample and
per-element KLD to N(0,1).  Returns per-frame per-channel tensors so the
caller applies length masking (``apply_lens_to_loss``), exactly like the
reference contract.
"""
from __future__ import annotations

from typing import Sequence


from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import Linear
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock


class VanillaVAE(Module):
    def __init__(self, fc_sizes: Sequence[int], latent_size: int):
        super().__init__()
        self.fc_sizes = [int(s) for s in fc_sizes]
        self.latent_size = int(latent_size)
        self.fc = self.child("fc", FCBlock(self.fc_sizes, end_activation=True))
        self.mean_fc = self.child("mean_fc", Linear(self.fc_sizes[-1], latent_size))
        self.log_var_fc = self.child(
            "log_var_fc", Linear(self.fc_sizes[-1], latent_size)
        )

    def apply(self, params, feats, rng=None, train: bool = False, **kwargs):
        stream = RngStream.ensure(rng)
        out = self.fc.apply(params["fc"], feats)
        mean = self.mean_fc.apply(params["mean_fc"], out)
        log_var = self.log_var_fc.apply(params["log_var_fc"], out)
        sampled_h = D.reparameterize(stream.next(), mean, log_var)
        loss = D.kld_std_normal(mean, log_var)
        return {
            "mean": mean,
            "log_var": log_var,
            "sampled_h": sampled_h,
            "loss": loss,
        }
