"""Harness recipe: BoundaryDetector alone; prediction = top-k boundary
probabilities where k is the forced-alignment boundary count (parity with
reference ``models/test_b_ind_classifier/model.py``, incl. the top-k pick at
``:56-63``)."""
from __future__ import annotations

import numpy as np

from mlvae_tpu.metrics.boundary import BoundaryMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss, undo_padding


class SBModel(MDModel):
    USED_BATCH_KEYS = {"feat", "fa_boundary_seq", "gt_boundary_seq"}
    EVAL_PRED_KEYS = frozenset({"boundary_v"})

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.stats_loggers["boundary_stats"] = BoundaryMetricStats()

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        fa_boundary = batch["fa_boundary_seq"][0]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, norm_state = self.hparams["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        out = self.modules["boundary_detector"].apply(
            params["boundary_detector"], feats, feat_lens, fa_boundary,
            rng=stream, train=train,
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return out, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        losses = {
            key: apply_lens_to_loss(value, feat_lens)
            for key, value in predictions["losses"].items()
        }
        return self.weighted_total(losses), losses

    def evaluate_predictions(self, predictions, batch, stage):
        feat_lens = batch["feat"][1]
        fa_boundary, _ = batch["fa_boundary_seq"]
        boundary_v = undo_padding(np.asarray(predictions["boundary_v"]),
                                  feat_lens)
        preds = []
        for i, bv in enumerate(boundary_v):
            k = int(np.asarray(fa_boundary[i]).sum())
            seq = np.zeros_like(bv)
            if k > 0:  # [-0:] would select EVERY frame, not none
                seq[np.argsort(bv)[-k:]] = 1
            preds.append(seq)
        targets = undo_padding(*batch["gt_boundary_seq"])
        self.stats_loggers["boundary_stats"].append(
            self._batch_ids, predictions=preds, targets=list(targets)
        )
