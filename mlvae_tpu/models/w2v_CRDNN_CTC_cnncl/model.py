"""w2v CRDNN+CTC on canonical targets, saving per-utterance recognizer
posteriors at TEST.

Parity with reference ``models/w2v_CRDNN_CTC_cnncl/model.py``: posteriors
resampled to the fbank frame rate are accumulated per utterance and written
to ``<output_dir>/saved_phn_recog_outs.pkl`` (pickle of numpy arrays; the
reference writes a torch ``.pt`` — same content, framework-neutral format),
consumed by ``MD_VAE_sfl_saved_phn_recog``.
"""
from __future__ import annotations

import pickle
import warnings
from pathlib import Path

import numpy as np

from mlvae_tpu.models.w2v_CRDNN_CTC.model import SBModel as W2V_CRDNN_CTC
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import resample_by_factor_np, undo_padding


class SBModel(W2V_CRDNN_CTC):
    CTC_TARGET_KEY = "gt_cnncl_seq"

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        if stage == Stage.TEST:
            self.saved_pouts = {}

    def evaluate_predictions(self, predictions, batch, stage):
        super().evaluate_predictions(predictions, batch, stage)
        if stage != Stage.TEST:
            return
        pout = np.asarray(predictions["pout"])
        feats, feat_lens = batch["feat"]
        T_feat = feats.shape[1]
        pout_rs = resample_by_factor_np(pout, T_feat)
        for utt_id, trimmed in zip(
            self._batch_ids, undo_padding(pout_rs, feat_lens)
        ):
            self.saved_pouts[utt_id] = trimmed

    def on_stage_end(self, stage, stage_loss, epoch=None):
        super().on_stage_end(stage, stage_loss, epoch)
        if stage == Stage.TEST:
            path = Path(self.hparams["output_dir"]) / \
                "saved_phn_recog_outs.pkl"
            existing = {}
            if path.exists():
                with open(path, "rb") as f:
                    existing = pickle.load(f)
                for key in self.saved_pouts:
                    if key in existing:
                        warnings.warn(f"duplicate key {key}")
            existing.update(self.saved_pouts)
            with open(path, "wb") as f:
                pickle.dump(existing, f)
