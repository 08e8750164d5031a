"""CRDNN+CTC trained on CANONICAL phonemes (parity with reference
``models/CRDNN_CTC_cnncl/model.py:37-44``: identical to CRDNN_CTC except
the CTC targets)."""
from __future__ import annotations

from mlvae_tpu.models.CRDNN_CTC.model import SBModel as CRDNN_CTC


class SBModel(CRDNN_CTC):
    CTC_TARGET_KEY = "gt_cnncl_seq"
