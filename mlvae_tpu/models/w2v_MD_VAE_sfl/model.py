"""MD_VAE_sfl (REINFORCE) over wav2vec2 features (parity with reference
``models/w2v_MD_VAE_sfl/model.py``)."""
from __future__ import annotations

from mlvae_tpu.models.MD_VAE_sfl.model import SBModel as MD_VAE_sfl
from mlvae_tpu.models.w2v_common import W2VMixin


class SBModel(W2VMixin, MD_VAE_sfl):
    USED_BATCH_KEYS = MD_VAE_sfl.USED_BATCH_KEYS | {"wav"}
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
