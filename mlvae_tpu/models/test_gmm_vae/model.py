"""Harness recipe: GMMVAE + Decoder (parity with reference
``models/test_gmm_vae/model.py``): the sampled latent is collapsed under the
hard Gumbel component weights before decoding, and the KLD is collapsed the
same way before masking."""
from __future__ import annotations

from mlvae_tpu.metrics.loss import LossMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss, apply_weight


class SBModel(MDModel):
    USED_BATCH_KEYS = {"feat"}
    EVAL_PRED_KEYS = frozenset()  # losses only; no host-side eval hooks

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.stats_loggers.setdefault("kld_loss_stats",
                                      LossMetricStats("kld_loss"))
        self.stats_loggers.setdefault("recon_loss_stats",
                                      LossMetricStats("recon_loss"))

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, norm_state = self.hparams["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        enc_out = self.modules["encoder"].apply(
            params["encoder"], feats, rng=stream, train=train
        )
        weighted_h = apply_weight(enc_out["sampled_h"], enc_out["gmm_weight"])
        dec_out = self.modules["decoder"].apply(
            params["decoder"], weighted_h, feats, rng=stream, train=train
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return {"encoder_out": enc_out, "decoder_out": dec_out}, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        enc_out = predictions["encoder_out"]
        kld = apply_weight(enc_out["loss"], enc_out["gmm_weight"])
        losses = {
            "kld_loss": apply_lens_to_loss(kld, feat_lens),
            "recon_loss": apply_lens_to_loss(
                predictions["decoder_out"]["losses"]["recon_loss"], feat_lens
            ),
        }
        return self.weighted_total(losses), losses
