"""Harness recipe: HierarchicalVAE driven by a sampled Bernoulli indicator
(parity with reference ``models/test_h_vae/model.py``): LSTM trunk ->
pi_fc logits -> Categorical sample (argmax at eval) -> two-branch VAE ->
Decoder."""
from __future__ import annotations

import jax.numpy as jnp

from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn import dist as D
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss


class SBModel(MDModel):
    USED_BATCH_KEYS = {"feat"}
    EVAL_PRED_KEYS = frozenset()  # losses only; no host-side eval hooks

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, norm_state = self.hparams["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        rnn_out, _ = self.modules["rnn"].apply(
            params["rnn"], feats, rng=stream, train=train
        )
        pi_logits = self.modules["pi_fc"].apply(params["pi_fc"], rnn_out)
        if train:
            sampled = D.categorical_sample(stream.next(), pi_logits)
        else:
            sampled = jnp.argmax(pi_logits, axis=-1)
        sampled = sampled.astype(feats.dtype)
        sampled_pi = jnp.stack([1 - sampled, sampled], axis=2)

        enc_out = self.modules["encoder"].apply(
            params["encoder"], rnn_out, sampled_pi, rng=stream, train=train
        )
        dec_out = self.modules["decoder"].apply(
            params["decoder"], enc_out["sampled_h"], feats,
            rng=stream, train=train,
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return {"encoder_out": enc_out, "decoder_out": dec_out}, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        raw = dict(predictions["encoder_out"]["losses"])
        raw["recon_loss"] = predictions["decoder_out"]["losses"]["recon_loss"]
        losses = {k: apply_lens_to_loss(v, feat_lens) for k, v in raw.items()}
        return self.weighted_total(losses), losses
