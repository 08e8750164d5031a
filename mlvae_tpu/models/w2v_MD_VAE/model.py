"""MD_VAE over wav2vec2 features.

Capability parity with reference ``models/w2v_MD_VAE/model.py``: each branch
consumes a dedicated FC projection of the frozen wav2vec2 features
(``phn_recog_in_fc`` / ``b_detector_in_fc`` / ``w2v_feat_fc``); the decoder
still reconstructs the normalized fbank features; two optimizers split the
wav2vec2 params from the rest (``model.yaml:162-182``).
"""
from __future__ import annotations

from mlvae_tpu.models.MD_VAE.model import SBModel as MD_VAE
from mlvae_tpu.models.w2v_common import W2VMixin


class SBModel(W2VMixin, MD_VAE):
    USED_BATCH_KEYS = MD_VAE.USED_BATCH_KEYS | {"wav"}
    PHN_FC_NAME = "phn_recog_out_fc"

    def _branch_inputs(self, params, feats, batch, stream, train):
        w2v = self._w2v_feats(params, batch, stream, train)
        return {
            "phn_in": self.modules["phn_recog_in_fc"].apply(
                params["phn_recog_in_fc"], w2v
            ),
            "bdet_in": self.modules["b_detector_in_fc"].apply(
                params["b_detector_in_fc"], w2v
            ),
            "vae_in": self.modules["w2v_feat_fc"].apply(
                params["w2v_feat_fc"], w2v
            ),
        }
