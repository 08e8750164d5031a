"""Baseline ASR-style MD recipe: CRDNN + CTC on pronounced phonemes.

Capability parity with reference ``models/CRDNN_CTC/model.py``: CTC training
on the *pronounced* phoneme sequence, greedy-decode PER against both
pronounced and canonical sequences, MD labels from the aligned
(pred vs canonical) sequences with insertions dropped, phoneme boundaries
via CTC segmentation (our forced-alignment Viterbi replaces the Cython
``ctc_segmentation`` package), and the MD sequence table written at TEST.

The reference sets ``jit_module_keys: [crdnn]`` to TorchScript the trunk —
here the entire step (CRDNN + CTC loss + grads + update) is one XLA program
by construction.
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from mlvae_tpu.metrics.boundary import BoundaryMetricStats
from mlvae_tpu.metrics.error_rate import ErrorRateStats
from mlvae_tpu.metrics.md import MDMetricStats
from mlvae_tpu.metrics.alignment import batch_align_sequences
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.ops import ctc as ctc_ops
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import resample_by_factor_np, undo_padding

logger = logging.getLogger(__name__)


class SBModel(MDModel):
    USED_BATCH_KEYS = {
        "feat", "gt_phn_seq", "gt_cnncl_seq", "gt_boundary_seq",
    }
    EVAL_PRED_KEYS = frozenset({"pout"})
    CTC_TARGET_KEY = "gt_phn_seq"  # cnncl variant overrides

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        # eval-only stats: the reference appends PER inside every training
        # compute_objectives (eager greedy decode per train batch,
        # CRDNN_CTC/model.py:69-80); here decode runs only at eval, so
        # registering these at TRAIN would log a bogus constant 0.0 PER
        if stage != Stage.TRAIN:
            self.stats_loggers["phn_per_stats"] = ErrorRateStats()
            self.stats_loggers["cnncl_per_stats"] = ErrorRateStats()
            self.stats_loggers["plvl_md_stats"] = MDMetricStats()
            self.stats_loggers["boundary_stats"] = BoundaryMetricStats()

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)
        feats, norm_state = self.modules["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        out = self.modules["crdnn"].apply(
            params["crdnn"], feats, rng=stream, train=train
        )
        out = self.modules["output"].apply(params["output"], out)
        pout = self.hparams["log_softmax"](out)
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return {"pout": pout}, new_states

    def compute_objectives(self, predictions, batch, stage):
        pout = predictions["pout"]
        pout_lens = batch["feat"][1]
        targets, target_lens = batch[self.CTC_TARGET_KEY]
        loss = ctc_ops.ctc_loss(
            pout, targets, pout_lens, target_lens,
            blank_index=self.hparams.get("blank_index", 0),
        )
        return loss, {}

    # ------------------------------------------------------------------
    # host-side evaluation
    # ------------------------------------------------------------------
    def evaluate_predictions(self, predictions, batch, stage):
        pout = np.asarray(predictions["pout"])
        pout_lens = np.asarray(batch["feat"][1])
        blank = self.hparams.get("blank_index", 0)

        pred_phns = ctc_ops.ctc_greedy_decode(pout, pout_lens, blank_id=blank)
        phns, phn_lens = batch["gt_phn_seq"]
        cnncls, cnncl_lens = batch["gt_cnncl_seq"]
        self.stats_loggers["phn_per_stats"].append(
            ids=self._batch_ids, predict=pred_phns, target=phns,
            target_len=phn_lens, ind2lab=self.label_encoder.decode_ndim
            if self.label_encoder else None,
        )
        self.stats_loggers["cnncl_per_stats"].append(
            ids=self._batch_ids, predict=pred_phns, target=cnncls,
            target_len=cnncl_lens, ind2lab=self.label_encoder.decode_ndim
            if self.label_encoder else None,
        )

        gt_phn_seqs = [list(map(int, s))
                       for s in undo_padding(np.asarray(phns), phn_lens)]
        gt_cnncl_seqs = [list(map(int, s))
                         for s in undo_padding(np.asarray(cnncls), cnncl_lens)]
        ali_gt, ali_pred, ali_cnncl = batch_align_sequences(
            gt_phn_seqs, pred_phns, gt_cnncl_seqs
        )

        boundary_seqs = self._ctc_segmentation(batch, pout, gt_cnncl_seqs,
                                               blank)
        gt_boundaries = [np.asarray(b) for b in
                         undo_padding(*batch["gt_boundary_seq"])]

        self.stats_loggers["plvl_md_stats"].append(
            self._batch_ids,
            pred_phn_seqs=ali_pred,
            gt_phn_seqs=ali_gt,
            gt_cnncl_seqs=ali_cnncl,
            pred_boundary_seqs=boundary_seqs,
            gt_boundary_seqs=gt_boundaries,
        )
        self.stats_loggers["boundary_stats"].append(
            self._batch_ids, predictions=boundary_seqs, targets=gt_boundaries
        )

    def _ctc_segmentation(self, batch, pout, gt_cnncl_seqs, blank):
        """Resample posteriors to the feature frame rate, then force-align
        each utterance to its canonical labels (reference
        ``model.py:134-176``)."""
        feats, feat_lens = batch["feat"]
        T_feat = feats.shape[1]
        pout_rs = resample_by_factor_np(pout, T_feat)

        out = []
        feat_lens = np.asarray(feat_lens)
        for i, labels in enumerate(gt_cnncl_seqs):
            n = int(round(float(feat_lens[i]) * T_feat))
            out.append(ctc_ops.ctc_segmentation_boundaries(
                pout_rs[i, :n], labels, blank_id=blank
            ))
        return out

    def on_stage_end(self, stage, stage_loss, epoch=None):
        super().on_stage_end(stage, stage_loss, epoch)
        if stage == Stage.TEST:
            path = Path(self.hparams["output_dir"]) / "test_output" / \
                "md_result_seqs.txt"
            path.parent.mkdir(parents=True, exist_ok=True)
            self.stats_loggers["plvl_md_stats"].write_seqs_to_file(
                path, self.label_encoder
            )
