"""Shared wav2vec2 plumbing for the w2v_* recipes."""
from __future__ import annotations

import jax.numpy as jnp


class W2VMixin:
    """Computes wav2vec2 features and length-matches them to the fbank frame
    axis (zero-pad / crop), mirroring reference
    ``models/w2v_MD_VAE/model.py:31-40``.  The reference asserts the raw
    length difference is in [-2, 0]; with bucketed static shapes the padded
    gap can be larger, and padded frames are masked by the relative lens
    downstream."""

    def _w2v_feats(self, params, batch, stream, train):
        wavs, _ = batch["wav"]
        w2v = self.modules["wav2vec2"].apply(
            params["wav2vec2"], wavs, rng=stream, train=train
        )
        T = batch["feat"][0].shape[1]
        diff = T - w2v.shape[1]
        if diff > 0:
            w2v = jnp.pad(w2v, ((0, 0), (0, diff), (0, 0)))
        elif diff < 0:
            w2v = w2v[:, :T]
        return w2v
