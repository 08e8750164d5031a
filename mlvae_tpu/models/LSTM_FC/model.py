"""Supervised frame-level MD classifier: LSTM + FC with class-weighted BCE.

Capability parity with reference ``models/LSTM_FC/model.py``: trains on
AUGMENTED features against augmented frame-level MD labels
(``model.py:24-27``), uses a positive-class weight ``misp_weight`` on the
mispronunciation logit (``model.py:50-53``), and scores frame-level MD
metrics.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mlvae_tpu.metrics.md import MDMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss, undo_padding


def _weighted_bce_with_logits(logits, targets, pos_weight):
    # torch semantics: loss = max(x,0) - x*y + (1 + (pw-1)*y) adjustment via
    # log-sigmoid formulation: -[pw*y*log s(x) + (1-y)*log(1-s(x))]
    log_sig = -jnp.logaddexp(0.0, -logits)       # log sigmoid(x)
    log_one_minus = -jnp.logaddexp(0.0, logits)  # log(1 - sigmoid(x))
    return -(pos_weight * targets * log_sig + (1 - targets) * log_one_minus)


class SBModel(MDModel):
    USED_BATCH_KEYS = {
        "feat", "aug_feat", "flvl_gt_md_lbl_seq", "aug_flvl_gt_md_lbl_seq",
    }
    EVAL_PRED_KEYS = frozenset({"out"})

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.stats_loggers["flvl_md_stats"] = MDMetricStats()

    def _feat_key(self, stage):
        return "aug_feat" if stage == Stage.TRAIN else "feat"

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch[self._feat_key(stage)]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)
        out, _ = self.modules["lstm"].apply(
            params["lstm"], feats, rng=stream, train=train
        )
        out = self.modules["fc"].apply(params["fc"], out)
        return {"out": out}, dict(states)

    def compute_objectives(self, predictions, batch, stage):
        out = predictions["out"]
        if stage == Stage.TRAIN:
            feat_lens = batch["aug_feat"][1]
            md, _ = batch["aug_flvl_gt_md_lbl_seq"]
        else:
            feat_lens = batch["feat"][1]
            md, _ = batch["flvl_gt_md_lbl_seq"]
        md = md.astype(out.dtype)
        targets = jnp.stack([1 - md, md], axis=-1)
        pos_weight = jnp.asarray(
            [1.0, float(self.hparams["misp_weight"])], out.dtype
        )
        loss_el = _weighted_bce_with_logits(out, targets, pos_weight)
        loss = apply_lens_to_loss(loss_el, feat_lens)
        return loss, {}

    def evaluate_predictions(self, predictions, batch, stage):
        out = np.asarray(predictions["out"])
        feat_lens = batch["feat"][1]
        md, md_lens = batch["flvl_gt_md_lbl_seq"]
        pred = undo_padding(out.argmax(-1), feat_lens)
        gt = undo_padding(np.asarray(md), md_lens)
        self.stats_loggers["flvl_md_stats"].append(
            self._batch_ids,
            pred_md_lbl_seqs=[list(p) for p in pred],
            gt_md_lbl_seqs=[list(g) for g in gt],
        )
