"""VAE decoder: latent -> bi-LSTM -> Gaussian mean/log-var heads.

Parity with reference ``modules/decoder.py``: 2-layer bidirectional LSTM,
two FCBlock heads, per-element Gaussian NLL (``loss_type='likelihood'``) or
MSE reconstruction loss.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.rnn import LSTM
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock


class Decoder(Module):
    def __init__(self, input_size: int, rnn_hidden_size: int,
                 rnn_num_layers: int, rnn_dropout: float,
                 fc_sizes: Sequence[int], loss_type: str = "likelihood"):
        super().__init__()
        if loss_type not in ("likelihood", "mse"):
            raise ValueError(f"Invalid loss type: {loss_type}")
        self.loss_type = loss_type
        self.rnn = self.child(
            "rnn",
            LSTM(input_size, rnn_hidden_size, rnn_num_layers,
                 batch_first=True, dropout=rnn_dropout, bidirectional=True),
        )
        self.mean_fc = self.child("mean_fc", FCBlock(fc_sizes))
        self.log_var_fc = self.child("log_var_fc", FCBlock(fc_sizes))

    def apply(self, params, sampled_h, target_feats, rng=None,
              train: bool = False, **kwargs):
        stream = RngStream.ensure(rng) if train else None
        rnn_out, _ = self.rnn.apply(params["rnn"], sampled_h,
                                    rng=stream, train=train)
        mean = self.mean_fc.apply(params["mean_fc"], rnn_out)
        log_var = self.log_var_fc.apply(params["log_var_fc"], rnn_out)
        if self.loss_type == "likelihood":
            loss = D.gaussian_nll(mean, log_var, target_feats)
        else:
            loss = jnp.square(target_feats - mean)
        return {
            "mean": mean,
            "log_var": log_var,
            "losses": {"recon_loss": loss},
        }
