"""MD_VAE_joint_ll: joint training with recognizer/boundary losses
stop-gradiented (only the VAE/likelihood path trains them indirectly).

Parity with reference ``models/MD_VAE_joint_ll/model.py``: like MD_VAE_joint
but the phoneme-recognizer and boundary-detector losses are detached
(``model.py:59-72``), and evaluation runs on every VALID epoch
(``model.py:184-185``).
"""
from __future__ import annotations

import logging

from mlvae_tpu.models.MD_VAE_joint.model import SBModel as MD_VAE_joint
from mlvae_tpu.training.brain import Stage

logger = logging.getLogger(__name__)


class SBModel(MD_VAE_joint):
    detach_inactive = True
    save_md_on_valid = False

    def to_run_evaluation(self, stage):
        return stage in (Stage.VALID, Stage.TEST)
