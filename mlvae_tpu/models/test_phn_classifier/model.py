"""Harness recipe: PhonemeRecognizer alone, scored by frame/phoneme accuracy
(parity with reference ``models/test_phn_classifier/model.py``)."""
from __future__ import annotations

import numpy as np

from mlvae_tpu.metrics.phn_acc import PhnAccMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import apply_lens_to_loss, undo_padding


class SBModel(MDModel):
    USED_BATCH_KEYS = {"feat", "gt_cnncl_seq", "fa_boundary_seq",
                       "flvl_gt_cnncl_seq", "gt_boundary_seq"}
    EVAL_PRED_KEYS = frozenset({"out"})

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.stats_loggers["phn_acc_stats"] = PhnAccMetricStats()

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        plvl_cnnl, plvl_lens = batch["gt_cnncl_seq"]
        boundary = batch["fa_boundary_seq"][0]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, norm_state = self.hparams["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        out = self.modules["phoneme_recognizer"].apply(
            params["phoneme_recognizer"], feats, feat_lens,
            plvl_cnnl, plvl_lens, boundary, rng=stream, train=train,
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return out, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        losses = {
            "phn_recog_bce_loss": apply_lens_to_loss(
                predictions["losses"]["phn_recog_bce_loss"], feat_lens
            )
        }
        return self.weighted_total(losses), losses

    def evaluate_predictions(self, predictions, batch, stage):
        feat_lens = batch["feat"][1]
        out = undo_padding(np.asarray(predictions["out"]), feat_lens)
        flvl = undo_padding(*batch["flvl_gt_cnncl_seq"])
        plvl = undo_padding(*batch["gt_cnncl_seq"])
        boundary = undo_padding(*batch["gt_boundary_seq"])
        self.stats_loggers["phn_acc_stats"].append(
            self._batch_ids,
            predictions=list(out),
            flvl_targets=list(flvl),
            plvl_targets=list(plvl),
            boundary_seqs=list(boundary),
        )
