"""Fine-tuned wav2vec2 + 1-unit FC binary MD classifier (parity with
reference ``models/w2v_LSTM_FC/model.py``: per-frame BCE against frame-level
MD labels, lengths cropped to the shorter of logits/labels)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mlvae_tpu.metrics.md import MDMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.models.w2v_common import W2VMixin
from mlvae_tpu.nn import dist as D
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss, undo_padding


class SBModel(W2VMixin, MDModel):
    USED_BATCH_KEYS = {"wav", "feat", "flvl_gt_md_lbl_seq"}
    EVAL_PRED_KEYS = frozenset({"logits"})

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.stats_loggers["flvl_md_stats"] = MDMetricStats()

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        train = stage == Stage.TRAIN
        stream = RngStream(rng)
        w2v = self._w2v_feats(params, batch, stream, train)
        logits = self.modules["classifier"].apply(params["classifier"], w2v)
        logits = jnp.squeeze(logits, axis=-1)  # (B, T)
        return {"logits": logits}, dict(states)

    def compute_objectives(self, predictions, batch, stage):
        logits = predictions["logits"]
        feat_lens = batch["feat"][1]
        md, _ = batch["flvl_gt_md_lbl_seq"]
        n = min(logits.shape[1], md.shape[1])
        loss_el = D.bce_with_logits(
            logits[:, :n], md[:, :n].astype(logits.dtype)
        )
        loss = apply_lens_to_loss(loss_el, feat_lens)
        return loss, {}

    def evaluate_predictions(self, predictions, batch, stage):
        logits = np.asarray(predictions["logits"])
        feat_lens = batch["feat"][1]
        md, _ = batch["flvl_gt_md_lbl_seq"]
        pred = (logits > 0).astype(np.int64)
        preds = undo_padding(pred, feat_lens)
        gts = undo_padding(np.asarray(md), feat_lens)
        self.stats_loggers["flvl_md_stats"].append(
            self._batch_ids,
            pred_md_lbl_seqs=[list(p) for p in preds],
            gt_md_lbl_seqs=[list(g) for g in gts],
        )
