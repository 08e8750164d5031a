"""Residual wav2vec2 SFL variant: each branch input is the concatenation of
the raw (normalized) fbank features and the wav2vec2-derived projection
(parity with reference ``models/w2v_MD_VAE_sfl_resi/model.py:40,58,79``)."""
from __future__ import annotations

import jax.numpy as jnp

from mlvae_tpu.models.w2v_MD_VAE_sfl.model import SBModel as W2V_SFL


class SBModel(W2V_SFL):
    def _branch_inputs(self, params, feats, batch, stream, train):
        inputs = super()._branch_inputs(params, feats, batch, stream, train)
        return {
            key: jnp.concatenate([feats, value], axis=-1)
            for key, value in inputs.items()
        }
