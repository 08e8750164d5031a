"""MD_VAE_joint: all three branches trained jointly every epoch.

Parity with reference ``models/MD_VAE_joint/model.py``: no per-epoch target
cycling, no stop-gradient on the recognizer/boundary losses
(``model.py:42-106``), VALID evaluation only every 10th epoch
(``model.py:174-182``), MD results saved on every evaluation pass
(``model.py:161``).
"""
from __future__ import annotations

import logging

from mlvae_tpu.models.MD_VAE.model import SBModel as MD_VAE
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.training.brain import Stage

logger = logging.getLogger(__name__)


class SBModel(MD_VAE):
    detach_inactive = False
    save_md_on_valid = True

    def on_stage_start(self, stage, epoch=None):
        self._stage_epoch = epoch
        # bypass MD_VAE's cycling: the VAE target runs every branch
        if stage in (Stage.TRAIN, Stage.VALID):
            self.target = Target.VAE
        else:
            self.target = Target.TEST
        logger.info("Epoch %s, stage %s: target is %s (joint)", epoch, stage,
                    self.target)
        # inherited stats init dispatches through the overridden
        # to_run_evaluation (eval every 10th VALID epoch)
        self._init_stage_stats(stage)

    def to_run_evaluation(self, stage):
        if stage == Stage.TRAIN:
            return False
        if stage == Stage.TEST:
            return True
        epoch = getattr(self, "_stage_epoch", None)
        if epoch is None:
            raise ValueError("epoch cannot be None")
        return epoch % 10 == 0
