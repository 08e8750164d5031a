"""Frame-level phoneme recognizer with duration-expanded multi-label BCE.

Parity with reference ``modules/phoneme_recognizer.py``: LSTM + FC ->
per-frame logits over ``n_phonemes + 2`` classes; the loss compares each
frame's logits against the one-hot canonical phoneme active at that frame
(canonical sequence expanded by forced-alignment durations).

TPU-native twist: the reference loops over the batch and
``repeat_interleave``s each canonical sequence by durations
(``phoneme_recognizer.py:52-77``, a Python loop with dynamic shapes).  Here
the expansion is a single gather: ``phoneme_index[t] = cumsum(boundary)[t]-1``
maps every frame to its phoneme slot, so the whole loss is one fused
gather + BCE over the padded (B, T, N) block, masked by frame validity.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.rnn import LSTM
from mlvae_tpu.nn import dist as D
from mlvae_tpu.modules.fc_block import FCBlock
from mlvae_tpu.utils.tensor import boundary_to_phoneme_index, length_mask


class PhonemeRecognizer(Module):
    def __init__(self, input_size: int, rnn_hidden_size: int,
                 rnn_num_layers: int, fc_sizes: Sequence[int],
                 n_phonemes: int):
        super().__init__()
        self.n_phonemes = int(n_phonemes)
        self.rnn = self.child(
            "rnn", LSTM(input_size, rnn_hidden_size, rnn_num_layers,
                        batch_first=True),
        )
        self.fc = self.child("fc", FCBlock(fc_sizes))

    def apply(self, params, feats, feat_lens, plvl_cnnl_phn_seqs,
              plvl_cnnl_phn_seq_lens, boundary_seqs, rng=None,
              train: bool = False, **kwargs):
        stream = RngStream.ensure(rng) if train else None
        rnn_out, _ = self.rnn.apply(params["rnn"], feats, rng=stream, train=train)
        out = self.fc.apply(params["fc"], rnn_out)  # (B, T, N)

        losses = self._compute_losses(
            out, feat_lens, plvl_cnnl_phn_seqs, boundary_seqs
        )
        return {"out": out, "losses": losses}

    def _compute_losses(self, out, feat_lens, plvl_cnnl_phn_seqs,
                        boundary_seqs):
        B, T, N = out.shape
        num_classes = self.n_phonemes + 2
        # frame -> phoneme slot (valid frames only; padded frames masked out)
        phn_idx = boundary_to_phoneme_index(boundary_seqs)  # (B, T)
        L = plvl_cnnl_phn_seqs.shape[1]
        phn_idx = jnp.minimum(phn_idx, L - 1)
        flvl_phn = jnp.take_along_axis(
            plvl_cnnl_phn_seqs.astype(jnp.int32), phn_idx, axis=1
        )  # (B, T)
        y = jax.nn.one_hot(flvl_phn, num_classes, dtype=out.dtype)  # (B, T, N)
        loss = D.bce_with_logits(out, y)  # (B, T, N)
        # zero out padded frames (the reference pads per-sample losses with 0)
        mask = length_mask(feat_lens, T, dtype=out.dtype)[..., None]
        return {"phn_recog_bce_loss": loss * mask}
