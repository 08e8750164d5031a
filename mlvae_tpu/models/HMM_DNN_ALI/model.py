"""DNN-HMM forced-alignment recipe.

Capability parity with reference ``models/HMM_DNN_ALI/model.py``: VanillaNN
acoustic model over 3-state-per-phoneme HMM outputs, trainable with
``forward`` (differentiable forward-algorithm score, in-jit), ``ctc``, or
``viterbi`` (NLL against stored alignments) objectives; Viterbi alignments
stored and scored for accuracy.

Scheduling: the reference recomputes and stores Viterbi alignments from
EVERY batch's posteriors inside ``compute_objectives`` — train batches
included (reference ``model.py:81-89``) — so under ``viterbi`` training
the NLL targets refresh continuously.  That is the default here too
(``realign_during_train`` defaults to True).  Setting it to False keeps
the train step a single XLA program (no host Viterbi per train batch);
alignments then refresh only on VALID/TEST passes, which never see train
utterances — train targets stay at the flat-start uniform split, so use
it only for the ``forward``/``ctc`` objectives or throughput baselines.
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.metrics.metric_stats import MetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.ops.losses import nll_loss
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import undo_padding

logger = logging.getLogger(__name__)


class SBModel(MDModel):
    USED_BATCH_KEYS = {
        "feat", "gt_cnncl_seq", "gt_phn_end_seq", "prev_alignments",
    }
    EVAL_PRED_KEYS = frozenset({"pout"})
    # the reference yaml selects on a metric this recipe never emits
    # (HMM_DNN_ALI/model.yaml:13), so key-less newest-checkpoint fallback
    # is its normal evaluate path, not a failed-train symptom
    ALLOW_KEYLESS_CKPT = True

    def on_stage_start(self, stage, epoch=None):
        super().on_stage_start(stage, epoch)
        self.training_type = self.hparams["init_training_type"]
        if self.training_type == "viterbi":
            # prev_alignments injected per batch change as the aligner store
            # refreshes; device-batch caching would freeze them
            self.cache_device_batches = False
            self._dev_batch_cache.clear()
        self.stats_loggers["accuracy_stats"] = MetricStats(
            metric=self.hparams["aligner"].calc_accuracy
        )

    def _step_key(self):
        return getattr(self, "training_type", None)

    def fit_batch(self, batch):
        loss = super().fit_batch(batch)
        if (self.training_type == "viterbi"
                and bool(self.hparams.get("realign_during_train", True))):
            # reference schedule (model.py:81-89): realign from THIS train
            # batch's posteriors so next epoch's NLL targets are one epoch
            # stale at most.  Forward-only eval step reuses the jit cache;
            # the prepared batch and device transfer are reused from the
            # fit step (the device-batch cache is off under viterbi, so a
            # fresh transfer here would double the per-step host RTT cost)
            prepared = self._last_prepared_batch
            dev_batch = self._last_dev_batch
            self.rng, step_rng = jax.random.split(self.rng)
            epoch = jnp.asarray(self.current_epoch(), jnp.int32)
            eval_step = self._get_compiled("eval", Stage.TRAIN)
            preds, _, _ = eval_step(
                self.params, self.states, step_rng, dev_batch, epoch
            )
            # _dispatch_evaluate trims DP replica padding (B % n_devices)
            self._dispatch_evaluate(preds, prepared, Stage.TRAIN)
        return loss

    def prepare_batch(self, batch):
        if getattr(self, "training_type", None) == "viterbi":
            pout_lens = batch["feat"][1]
            phns, phn_lens = batch["gt_cnncl_seq"]
            aligner = self.hparams["aligner"]
            states = np.asarray(
                aligner.expand_phns_by_states_per_phoneme(phns, phn_lens)
            )
            # dummy pout shape for length bookkeeping
            T = batch["feat"][0].shape[1]
            fake_pout = np.zeros((len(batch["id"]), T, 1), np.float32)
            prev = aligner.get_prev_alignments(
                batch["id"], fake_pout, pout_lens, states, phn_lens
            )
            batch._data["prev_alignments"] = (prev, np.asarray(pout_lens))
        return batch

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        feats, feat_lens = batch["feat"]
        train = stage == Stage.TRAIN
        stream = RngStream(rng)
        out = self.modules["model"].apply(
            params["model"], feats, rng=stream, train=train
        )
        out = self.modules["output"].apply(params["output"], out)
        # per-utterance scaled-likelihood prior (reference model.py:43
        # subtracts an unmasked time mean; its padding is per-batch dynamic
        # and small, ours is bucketed to 32-frame multiples — a masked mean
        # keeps posteriors independent of batch composition/bucket size)
        from mlvae_tpu.utils.tensor import length_mask
        mask = length_mask(feat_lens, out.shape[1], dtype=out.dtype)[..., None]
        denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        out = out - (out * mask).sum(axis=1, keepdims=True) / denom
        pout = self.hparams["log_softmax"](out)
        return {"pout": pout}, dict(states)

    def compute_objectives(self, predictions, batch, stage):
        pout = predictions["pout"]
        pout_lens = batch["feat"][1]
        phns, phn_lens = batch["gt_cnncl_seq"]
        aligner = self.hparams["aligner"]
        states = aligner.expand_phns_by_states_per_phoneme(phns, phn_lens)

        if self.training_type == "forward":
            loss = -aligner.forward_score(pout, pout_lens, states, phn_lens)
        elif self.training_type == "ctc":
            loss = self.hparams["compute_cost_ctc"](
                pout, states, pout_lens, phn_lens
            )
        elif self.training_type == "viterbi":
            prev, _ = batch["prev_alignments"]
            loss = self.hparams["compute_cost_nll"](
                pout, prev, length=pout_lens
            )
        else:
            raise ValueError(f"unknown training type: {self.training_type}")
        return loss, {}

    def evaluate_predictions(self, predictions, batch, stage):
        pout = np.asarray(predictions["pout"])
        pout_lens = batch["feat"][1]
        phns, phn_lens = batch["gt_cnncl_seq"]
        aligner = self.hparams["aligner"]
        states = np.asarray(
            aligner.expand_phns_by_states_per_phoneme(phns, phn_lens)
        )
        _, alignments = aligner.viterbi(pout, pout_lens, states, phn_lens)
        aligner.store_alignments(self._batch_ids, alignments)

        phn_ends = undo_padding(*batch["gt_phn_end_seq"])
        phns_orig = undo_padding(np.asarray(phns), phn_lens)
        self.stats_loggers["accuracy_stats"].append(
            self._batch_ids, alignments, list(phn_ends), list(phns_orig)
        )
