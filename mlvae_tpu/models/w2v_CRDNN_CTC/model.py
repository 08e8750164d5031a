"""CRDNN+CTC over wav2vec2 features (parity with reference
``models/w2v_CRDNN_CTC/model.py``: small CRDNN trunk on the encoder output,
fine-tuned wav2vec2)."""
from __future__ import annotations

from mlvae_tpu.models.CRDNN_CTC.model import SBModel as CRDNN_CTC
from mlvae_tpu.models.w2v_common import W2VMixin
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage


class SBModel(W2VMixin, CRDNN_CTC):
    USED_BATCH_KEYS = CRDNN_CTC.USED_BATCH_KEYS | {"wav"}

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        train = stage == Stage.TRAIN
        stream = RngStream(rng)
        w2v = self._w2v_feats(params, batch, stream, train)
        out = self.modules["crdnn"].apply(
            params["crdnn"], w2v, rng=stream, train=train
        )
        out = self.modules["output"].apply(params["output"], out)
        pout = self.hparams["log_softmax"](out)
        return {"pout": pout}, dict(states)
