"""Harness recipe: VanillaVAE + Decoder trained end-to-end on features.

Capability parity with reference ``models/test_vanilla_vae/model.py``
(one of the module-isolation integration recipes, SURVEY.md §4 item 2).
This is also the BASELINE.md gate-config slice: config load -> features ->
VAE ELBO train (one fused jitted step) -> checkpoint -> evaluate.
"""
from __future__ import annotations

from mlvae_tpu.metrics.loss import LossMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss


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

        normalizer = self.hparams["normalizer"]
        feats, norm_state = normalizer.apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )

        enc_out = self.modules["encoder"].apply(
            params["encoder"], feats, rng=stream, train=train
        )
        dec_out = self.modules["decoder"].apply(
            params["decoder"], enc_out["sampled_h"], feats,
            rng=stream, train=train,
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return {"encoder_out": enc_out, "decoder_out": dec_out,
                "feat_lens": feat_lens}, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        losses = {
            "kld_loss": apply_lens_to_loss(
                predictions["encoder_out"]["loss"], feat_lens
            ),
            "recon_loss": apply_lens_to_loss(
                predictions["decoder_out"]["losses"]["recon_loss"], feat_lens
            ),
        }
        return self.weighted_total(losses), losses
