"""MD_VAE_sfl over pre-saved phoneme-recognizer outputs.

Parity with reference ``models/MD_VAE_sfl_saved_phn_recog/model.py``: the
recognizer network is skipped entirely; per-utterance posteriors produced by
``w2v_CRDNN_CTC_cnncl`` at TEST time (reference ``model.py:36-38``, file
referenced by ``hparams.phn_recog_outs_path`` relative to the parent of the
output dir) are attached to each batch, and the training target cycles two
ways (B_DETECTOR -> VAE, ``model.py:27-29``).

Saved-output files are pickles of ``{utt_id: (T, N) float array}`` (written
by our w2v_CRDNN_CTC_cnncl recipe); ``torch.load`` is attempted as a
fallback so reference-produced ``.pt`` files also load.
"""
from __future__ import annotations

import logging
import pickle
from pathlib import Path

import numpy as np

from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.models.MD_VAE_sfl.model import SBModel as MD_VAE_sfl
from mlvae_tpu.training.brain import Stage

logger = logging.getLogger(__name__)


def _load_saved_outputs(path):
    try:
        with open(path, "rb") as f:
            data = pickle.load(f)
    except (pickle.UnpicklingError, EOFError):
        import torch
        data = {k: v.numpy() for k, v in torch.load(path).items()}
    return {k: np.asarray(v, np.float32) for k, v in data.items()}


class SBModel(MD_VAE_sfl):
    USED_BATCH_KEYS = (MD_VAE_sfl.USED_BATCH_KEYS
                       | {"saved_phn_recog_out"})

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        # 2-way cycle replaces MD_VAE's 3-way cycle
        if stage in (Stage.TRAIN, Stage.VALID):
            cycle = [Target.B_DETECTOR, Target.VAE]
            self.target = cycle[(epoch - 1) % 2]
            logger.info("Epoch %s: 2-way target is %s", epoch, self.target)
            self._init_stage_stats(stage)  # stats depend on the new target
        if not hasattr(self, "saved_phn_recog_outs"):
            path = Path(self.hparams["output_dir"]).parent / \
                self.hparams["phn_recog_outs_path"]
            self.saved_phn_recog_outs = _load_saved_outputs(path)
            logger.info("loaded %d saved recognizer outputs from %s",
                        len(self.saved_phn_recog_outs), path)

    def prepare_batch(self, batch):
        """Attach pre-saved recognizer posteriors, padded to the batch's
        feature length."""
        feats, feat_lens = batch["feat"]
        B, T = feats.shape[0], feats.shape[1]
        missing = [u for u in batch["id"]
                   if u not in self.saved_phn_recog_outs]
        if missing:
            raise KeyError(
                f"no saved recognizer outputs for utterances {missing[:5]} "
                f"(have {len(self.saved_phn_recog_outs)}); the dump from "
                "w2v_CRDNN_CTC_cnncl must cover every set this recipe "
                "touches — produce it with cli.test_on_three_sets (its TEST "
                "pass over train/valid/test accumulates all utterances), "
                "not cli.test")
        outs = [self.saved_phn_recog_outs[utt_id] for utt_id in batch["id"]]
        N = outs[0].shape[1]
        padded = np.zeros((B, T, N), np.float32)
        for i, o in enumerate(outs):
            n = min(T, o.shape[0])
            padded[i, :n] = o[:n]
        batch._data["saved_phn_recog_out"] = (padded, np.asarray(feat_lens))
        return batch

    def _phn_recog_branch(self, params, feats, feat_lens, batch, stream,
                          train):
        return {"out": batch["saved_phn_recog_out"][0], "losses": {}}
