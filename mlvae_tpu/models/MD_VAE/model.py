"""Flagship recipe: hierarchical-VAE mispronunciation detection.

Capability parity with reference ``models/MD_VAE/model.py``:

* alternating per-epoch training targets PHN_RECOG -> B_DETECTOR -> VAE via
  ``(epoch-1) % 3`` (``model.py:36-39``);
* forward = phoneme recognizer + boundary detector + [feat_fc ⊕
  phn_recog_fc(stop-grad) -> concat_fc -> LSTM -> pi_fc -> Categorical π ->
  HierarchicalVAE -> Decoder] (``model.py:61-160``);
* π supervised by NLL against DP-decoded frame MD labels (self-training,
  ``model.py:133-150``);
* VALID evaluation only on VAE-target epochs; TEST decodes boundaries + MD
  labels and saves MD results JSON for the data-cleaning round trip
  (``model.py:232-272``).

TPU-native difference: the MD Viterbi decode that the reference runs in a
joblib fork pool *inside the training forward* runs here as a batched
``lax.scan`` DP on device (``mlvae_tpu.ops.decode.md_viterbi_batch``), so
the whole train step — including the self-training target construction —
compiles to one XLA program with no host round trip.
"""
from __future__ import annotations

import json
import logging
import warnings
from enum import Enum, auto
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.metrics.boundary import BoundaryMetricStats
from mlvae_tpu.metrics.loss import LossMetricStats
from mlvae_tpu.metrics.md import MDMetricStats
from mlvae_tpu.models.md_model import MDModel
from mlvae_tpu.nn import dist as D
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.ops import decode as dec
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.utils.tensor import (abs_lengths, apply_lens_to_loss,
                                    undo_padding)

logger = logging.getLogger(__name__)


class Target(Enum):
    PHN_RECOG = auto()
    B_DETECTOR = auto()
    VAE = auto()
    TEST = auto()


class SBModel(MDModel):
    USED_BATCH_KEYS = {
        "feat", "gt_cnncl_seq", "fa_boundary_seq",
        "gt_boundary_seq", "plvl_gt_md_lbl_seq", "prior",
    }
    # evaluate_predictions/save_md_result read only the decoded MD
    # sequences (model.py evaluate path, reference MD_VAE/model.py:187-218)
    EVAL_PRED_KEYS = frozenset({
        "decoded_boundary_seq", "decoded_plvl_md_lbl_seq",
        "decoded_t_lens", "decoded_l_lens",
    })

    def used_batch_keys(self):
        keys = set(self.USED_BATCH_KEYS)
        if self.hparams.get("use_kaldi_feat", False):
            keys.add("kaldi_feat")  # the SFL input path (model.yaml:7)
        return keys
    # Subclass knobs: joint variants disable the inactive-branch
    # stop-gradient (MD_VAE_joint) or save MD results on VALID too; w2v
    # variants rename the recognizer-output FC module.
    detach_inactive = True
    save_md_on_valid = False
    PHN_FC_NAME = "phn_recog_fc"

    # ------------------------------------------------------------------
    # stage hooks
    # ------------------------------------------------------------------
    def on_stage_start(self, stage, epoch=None):
        if stage in (Stage.TRAIN, Stage.VALID):
            assert epoch is not None
            cycle = [Target.PHN_RECOG, Target.B_DETECTOR, Target.VAE]
            self.target = cycle[(epoch - 1) % 3]
        elif stage == Stage.TEST:
            self.target = Target.TEST
        else:
            raise ValueError(f"invalid stage {stage}")
        logger.info("Epoch %s, stage %s: target is %s", epoch, stage,
                    self.target)
        self._init_stage_stats(stage)

    def _init_stage_stats(self, stage):
        self._pending_md_results = {}
        self.stats_loggers = {}
        if stage == Stage.TRAIN or self.to_run_evaluation(stage):
            for key in self.hparams.get("metric_keys", []):
                if key.endswith("_loss"):
                    self.stats_loggers[key + "_stats"] = LossMetricStats(key)
        if self.to_run_evaluation(stage):
            self.stats_loggers["plvl_md_stats"] = MDMetricStats()
            self.stats_loggers["boundary_stats"] = BoundaryMetricStats()

    def to_run_evaluation(self, stage):
        return (stage == Stage.VALID and self.target == Target.VAE) \
            or (stage == Stage.TEST)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        self._flush_md_results()
        # reference skips VALID logging/checkpointing off VAE epochs
        if stage == Stage.VALID and not self.to_run_evaluation(stage):
            return
        super().on_stage_end(stage, stage_loss, epoch)

    def prepare_batch(self, batch):
        batch = super().prepare_batch(batch)
        # the Viterbi self-training decode needs T >= L per utterance; the
        # reference's per-utterance decode asserts this deep in the DP
        # (decode_utils.py:542), while the batched on-device decode would
        # silently emit a truncated boundary seq — fail loudly at the source
        feats, feat_lens = batch["feat"]
        cn, cn_lens = batch["gt_cnncl_seq"]
        t = np.round(np.asarray(feat_lens, np.float32) * feats.shape[1])
        l = np.round(np.asarray(cn_lens, np.float32) * cn.shape[1])
        bad = np.where(t < l)[0]
        if len(bad):
            ids = [batch["id"][i] for i in bad]
            raise ValueError(
                f"utterances with fewer frames than canonical phonemes "
                f"(T < L), undecodable: {ids[:5]}"
                f"{'...' if len(ids) > 5 else ''}")
        # recognizer-target sanity (reference phoneme_recognizer.py:66-71
        # asserts boundary count == L per sample; our in-graph gather clamps
        # instead, so surface mismatched forced alignments here).  WARN, not
        # raise: generate_boundary_seq legitimately drops a boundary when
        # the bump-right collision rule pushes it past the last frame.
        fa_b, fa_lens = batch["fa_boundary_seq"]
        Tb = np.asarray(fa_b).shape[1]
        tmask = np.arange(Tb)[None, :] < np.round(
            np.asarray(fa_lens, np.float32) * Tb)[:, None]
        ones = (np.asarray(fa_b) * tmask).sum(axis=1)
        mism = np.where(ones != l)[0]
        if len(mism):
            ids = [batch["id"][i] for i in mism]
            logger.warning(
                "forced-alignment boundary count != canonical length for "
                "%d utterance(s) (recognizer targets clamped): %s%s",
                len(mism), ids[:5], "..." if len(ids) > 5 else "")
        return batch

    # ------------------------------------------------------------------
    # decode inside the step (device DP)
    # ------------------------------------------------------------------
    def _decode_on_device(self, predictions, batch, weight):
        phn_out = predictions["phn_recog_out"]
        B, T, N = phn_out.shape
        plvl_cnnl, plvl_lens = batch["gt_cnncl_seq"]
        L = plvl_cnnl.shape[1]
        t_lens = abs_lengths(batch["feat"][1], T)
        l_lens = abs_lengths(plvl_lens, L)

        log_p_yx, log_p_y, log_p_b, log_p_pi = dec.build_viterbi_inputs(
            phn_out, predictions["boundary_v"], predictions["pi_logits"],
            batch["prior"][0][0],
        )

        boundary, flvl, plvl = dec.md_viterbi_batch(
            jax.lax.stop_gradient(log_p_yx), log_p_y,
            plvl_cnnl.astype(jnp.int32),
            jax.lax.stop_gradient(log_p_b),
            jax.lax.stop_gradient(log_p_pi),
            t_lens, l_lens, weight,
        )
        return boundary, flvl, plvl, t_lens, l_lens

    # ------------------------------------------------------------------
    # pure forward / objectives
    # ------------------------------------------------------------------
    def _branch_inputs(self, params, feats, batch, stream, train):
        """Per-branch input features; the w2v variants override this to feed
        wav2vec2-derived projections instead of fbank features."""
        vae_in = self.modules["feat_fc"].apply(params["feat_fc"], feats)
        return {"phn_in": feats, "bdet_in": feats, "vae_in": vae_in}

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        if not hasattr(self, "target"):
            raise ValueError("target is not defined")
        target = self.target
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, feat_lens = batch["feat"]
        normalizer = self.hparams["normalizer"]
        feats, norm_state = normalizer.apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state

        predictions = {"losses": {}}

        def maybe_detach(losses, active):
            if active or not self.detach_inactive:
                return losses
            return {k: jax.lax.stop_gradient(v) for k, v in losses.items()}

        inputs = self._branch_inputs(params, feats, batch, stream, train)

        if target in (Target.PHN_RECOG, Target.VAE, Target.TEST):
            plvl_cnnl, plvl_lens = batch["gt_cnncl_seq"]
            fa_boundary = batch["fa_boundary_seq"][0]
            phn_out = self.modules["phoneme_recognizer"].apply(
                params["phoneme_recognizer"], inputs["phn_in"], feat_lens,
                plvl_cnnl, plvl_lens, fa_boundary, rng=stream, train=train,
            )
            predictions["phn_recog_out"] = phn_out["out"]
            predictions["losses"].update(
                maybe_detach(phn_out["losses"], target == Target.PHN_RECOG)
            )

        if target in (Target.B_DETECTOR, Target.VAE, Target.TEST):
            fa_boundary = batch["fa_boundary_seq"][0]
            bd_out = self.modules["boundary_detector"].apply(
                params["boundary_detector"], inputs["bdet_in"], feat_lens,
                fa_boundary, rng=stream, train=train,
            )
            predictions["boundary_v"] = bd_out["boundary_v"]
            predictions["losses"].update(
                maybe_detach(bd_out["losses"], target == Target.B_DETECTOR)
            )

        if target in (Target.VAE, Target.TEST):
            feat_fc_out = inputs["vae_in"]
            phn_recog_fc_out = self.modules[self.PHN_FC_NAME].apply(
                params[self.PHN_FC_NAME],
                jax.lax.stop_gradient(predictions["phn_recog_out"]),
            )
            rnn_in = jnp.concatenate([feat_fc_out, phn_recog_fc_out], axis=-1)
            rnn_in = self.modules["concat_fc"].apply(
                params["concat_fc"], rnn_in
            )
            rnn_out, _ = self.modules["rnn"].apply(
                params["rnn"], rnn_in, rng=stream, train=train
            )
            pi_logits = self.modules["pi_fc"].apply(params["pi_fc"], rnn_out)
            predictions["pi_logits"] = pi_logits

            if train:
                sampled = D.categorical_sample(stream.next(), pi_logits)
            else:
                sampled = jnp.argmax(pi_logits, axis=-1)
            sampled = sampled.astype(feats.dtype)  # (B, T)
            sampled_pi = jnp.stack([1 - sampled, sampled], axis=2)
            predictions["sampled_pi"] = sampled_pi

            # self-training target for pi: on-device MD Viterbi decode
            weight = float(self.hparams.get("dec_weight", 1.0))
            boundary, flvl, plvl, t_lens, l_lens = self._decode_on_device(
                predictions, batch, weight
            )
            predictions["decoded_boundary_seq"] = boundary
            predictions["decoded_flvl_md_lbl_seq"] = flvl
            predictions["decoded_plvl_md_lbl_seq"] = plvl
            predictions["decoded_t_lens"] = t_lens
            predictions["decoded_l_lens"] = l_lens

            pi_nll_loss = -D.categorical_log_prob(
                pi_logits, flvl.astype(jnp.int32)
            )
            predictions["losses"]["pi_nll_loss"] = pi_nll_loss

            enc_out = self.modules["encoder"].apply(
                params["encoder"], rnn_out, sampled_pi,
                rng=stream, train=train,
            )
            predictions["losses"].update(enc_out["losses"])
            dec_out = self.modules["decoder"].apply(
                params["decoder"], enc_out["sampled_h"], feats,
                rng=stream, train=train,
            )
            predictions["losses"].update(dec_out["losses"])

        return predictions, new_states

    def compute_objectives(self, predictions, batch, stage):
        _, feat_lens = batch["feat"]
        losses = {
            key: apply_lens_to_loss(value, feat_lens)
            for key, value in predictions["losses"].items()
        }
        return self.weighted_total(losses), losses

    # ------------------------------------------------------------------
    # host-side evaluation + MD-result saving
    # ------------------------------------------------------------------
    def evaluate_predictions(self, predictions, batch, stage):
        if not self.to_run_evaluation(stage):
            return
        boundary = np.asarray(predictions["decoded_boundary_seq"])
        plvl = np.asarray(predictions["decoded_plvl_md_lbl_seq"])
        t_lens = np.asarray(predictions["decoded_t_lens"])
        l_lens = np.asarray(predictions["decoded_l_lens"])
        B = boundary.shape[0]
        pred_boundary = [boundary[i, : t_lens[i]] for i in range(B)]
        pred_plvl = [plvl[i, : l_lens[i]] for i in range(B)]

        gt_md_seqs = undo_padding(*batch["plvl_gt_md_lbl_seq"])
        gt_b_seqs = undo_padding(*batch["gt_boundary_seq"])

        self.stats_loggers["plvl_md_stats"].append(
            ids=self._batch_ids,
            pred_md_lbl_seqs=pred_plvl,
            gt_md_lbl_seqs=gt_md_seqs,
            pred_boundary_seqs=pred_boundary,
            gt_boundary_seqs=gt_b_seqs,
        )
        self.stats_loggers["boundary_stats"].append(
            ids=self._batch_ids,
            predictions=pred_boundary,
            targets=gt_b_seqs,
        )

        if stage == Stage.TEST or self.save_md_on_valid:
            self.save_md_result(self._batch_ids, pred_boundary, pred_plvl)

    def save_md_result(self, utt_ids, boundary_seqs, plvl_md_seqs):
        """Record per-utterance mispronunciation spans for the
        saved-MD-results data-cleaning round trip (reference
        ``model.py:232-272`` <-> ``data_io.py:107-131``).  Accumulated in
        memory per stage and flushed once in ``on_stage_end`` (the
        reference re-reads and rewrites the JSON per batch — O(n^2) at
        corpus scale); file-merge semantics are kept at flush time so
        ``test_on_three_sets`` accumulates all three sets' results."""
        for utt_id, boundary, md in zip(utt_ids, boundary_seqs, plvl_md_seqs):
            T = len(boundary)
            idx = np.where(np.asarray(boundary) == 1)[0].tolist() + [T]
            pct = [i / T for i in idx]
            utt_results = []
            for misp_idx in np.where(np.asarray(md) == 1)[0]:
                start_pct, end_pct = pct[misp_idx], pct[misp_idx + 1]
                if start_pct == end_pct:
                    warnings.warn("empty mispronunciation span")
                    continue
                utt_results.append([int(misp_idx), start_pct, end_pct])
            self._pending_md_results[utt_id] = utt_results

    def _flush_md_results(self):
        md_results = getattr(self, "_pending_md_results", None)
        if not md_results:
            return
        save_dir = Path("datasets") / self.hparams["dataset_name"] / \
            "saved_md_results"
        save_dir.mkdir(parents=True, exist_ok=True)
        save_path = save_dir / f"{self.hparams['model_name']}.json"
        if save_path.exists():
            with open(save_path) as f:
                existing = json.load(f)
            existing.update(md_results)
            md_results = existing
        with open(save_path, "w") as f:
            json.dump(md_results, f)
        self._pending_md_results = {}
