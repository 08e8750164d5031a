"""Hierarchical VAE: Bernoulli mixture of a Vanilla branch (correct
pronunciation) and a GMM branch (mispronunciation).

Parity with reference ``modules/h_vae.py``: both branches run on the shared
input, GMM component stats collapse under the Gumbel weights, then the two
branches mix under the (B, T, 2) indicator ``pi``.  Collapses use einsum
(``apply_weight``) instead of batched bmm.  Emits per-element
``vae_kld_loss``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.modules.vanilla_vae import VanillaVAE
from mlvae_tpu.modules.gmm_vae import GMMVAE
from mlvae_tpu.utils.tensor import apply_weight


class HierarchicalVAE(Module):
    def __init__(self, fc_sizes: Sequence[int], latent_size: int,
                 num_components: int):
        super().__init__()
        self.fc_sizes = [int(s) for s in fc_sizes]
        self.latent_size = int(latent_size)
        self.num_components = int(num_components)
        self.vanilla_vae = self.child(
            "vanilla_vae", VanillaVAE(self.fc_sizes, latent_size)
        )
        self.gmm_vae = self.child(
            "gmm_vae", GMMVAE(self.fc_sizes, latent_size, num_components)
        )

    def apply(self, params, feats, pi, rng=None, train: bool = False, **kwargs):
        stream = RngStream.ensure(rng)
        vanilla = self.vanilla_vae.apply(
            params["vanilla_vae"], feats, rng=stream, train=train
        )
        gmm = self.gmm_vae.apply(params["gmm_vae"], feats, rng=stream, train=train)

        w = gmm["gmm_weight"]  # (B, T, N)
        gmm_mean = apply_weight(gmm["mean"], w)
        gmm_log_var = apply_weight(gmm["log_var"], w)
        gmm_h = apply_weight(gmm["sampled_h"], w)
        gmm_loss = apply_weight(gmm["loss"], w)

        def mix(a, b):
            return apply_weight(jnp.stack([a, b], axis=2), pi)

        mean = mix(vanilla["mean"], gmm_mean)
        log_var = mix(vanilla["log_var"], gmm_log_var)
        h = mix(vanilla["sampled_h"], gmm_h)
        kld_loss = mix(vanilla["loss"], gmm_loss)

        return {
            "gmm_weight": w,
            "mean": mean,
            "log_var": log_var,
            "sampled_h": h,
            "losses": {"vae_kld_loss": kld_loss},
        }
