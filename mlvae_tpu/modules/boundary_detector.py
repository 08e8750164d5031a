"""Phoneme-boundary detector with Kumaraswamy/Beta latent boundaries.

Parity with reference ``modules/boundary_detector.py``: LSTM -> Softplus
alpha/beta heads (+eps), Kumaraswamy inverse-CDF sampling averaged over
``sample_times=10`` draws with per-draw BCE against forced-alignment
boundaries, and closed-form KL(Beta(alpha,beta) || Beta(1,9)).

TPU-native twist: the 10 MC draws are one batched sample along a leading
axis folded by a mean — a single fused elementwise kernel instead of a
Python loop over separate CUDA launches.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import softplus
from mlvae_tpu.nn.rnn import LSTM
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock


class BoundaryDetector(Module):
    PRIOR_ALPHA = 1.0
    PRIOR_BETA = 9.0
    SAMPLE_TIMES = 10

    def __init__(self, input_size: int, rnn_hidden_size: int,
                 rnn_num_layers: int, fc_sizes: Sequence[int]):
        super().__init__()
        self.rnn = self.child(
            "rnn", LSTM(input_size, rnn_hidden_size, rnn_num_layers,
                        batch_first=True),
        )
        self.fc_alpha = self.child("fc_alpha", FCBlock(fc_sizes))
        self.fc_beta = self.child("fc_beta", FCBlock(fc_sizes))

    def apply(self, params, x, feat_lens, boundary_seqs, rng=None,
              train: bool = False, **kwargs):
        stream = RngStream.ensure(rng)
        rnn_out, _ = self.rnn.apply(params["rnn"], x, rng=stream, train=train)
        eps = 1e-5
        v_alpha = softplus(self.fc_alpha.apply(params["fc_alpha"], rnn_out))
        v_alpha = jnp.squeeze(v_alpha, axis=-1) + eps  # (B, T)
        v_beta = softplus(self.fc_beta.apply(params["fc_beta"], rnn_out))
        v_beta = jnp.squeeze(v_beta, axis=-1) + eps  # (B, T)

        kld_loss = D.kld_beta(v_alpha, v_beta, self.PRIOR_ALPHA, self.PRIOR_BETA)

        # M draws at once: (M, B, T)
        M = self.SAMPLE_TIMES
        alpha_m = jnp.broadcast_to(v_alpha, (M,) + v_alpha.shape)
        beta_m = jnp.broadcast_to(v_beta, (M,) + v_beta.shape)
        v_m = D.kumaraswamy_sample(stream.next(), alpha_m, beta_m)
        targets = jnp.broadcast_to(boundary_seqs.astype(v_m.dtype), v_m.shape)
        bce_loss = D.bce(v_m, targets).mean(axis=0)  # (B, T)
        boundary_v = v_m.mean(axis=0)  # (B, T)

        return {
            "boundary_v": boundary_v,
            "losses": {
                "boundary_bce_loss": bce_loss,
                "boundary_kld_loss": kld_loss,
            },
        }
