"""MD_VAE_sfl: score-function (REINFORCE) learning of the Bernoulli
indicator π.

Parity with reference ``models/MD_VAE_sfl/model.py``:

* ``pi_mcmc_num`` Monte-Carlo π samples per step at train time, 1 (argmax)
  at eval (``model.py:139-151``);
* reward = −(recon_w·recon + vae_kld_w·kld + pi_nll_w·π-NLL), all detached
  (``model.py:176-178``);
* ``rif_loss = (reward − baseline.detach()) · nll`` with a learned
  ``baseline_fc`` head, entropy bonus, and baseline MSE (``model.py:180-182``);
* the categorical log-likelihood uses the reference's bmm trick
  (``utils/data_utils.py:184-208``) over torch-normalized logits
  (``Categorical.logits`` is log-softmaxed at construction), via
  ``categorical_ll_onehot``;
* optional ``use_kaldi_feat`` input path (``model.py:59-63``);
* selection key ``plvl_md.soft_F1``.

The stop-gradient placement mirrors every ``.detach()`` of the reference
(SURVEY §7 hard part 6).
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from mlvae_tpu.models.MD_VAE.model import SBModel as MD_VAE
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.nn import dist as D
from mlvae_tpu.nn.core import RngStream
from mlvae_tpu.training.brain import Stage

logger = logging.getLogger(__name__)


class SBModel(MD_VAE):
    # module name differs from MD_VAE (reference model.yaml:43)
    PHN_FC_NAME = "phn_recog_out_fc"

    def _phn_recog_branch(self, params, feats, feat_lens, batch, stream,
                          train):
        """Recognizer sub-network; MD_VAE_sfl_saved_phn_recog overrides this
        with a lookup of pre-saved posteriors."""
        plvl_cnnl, plvl_lens = batch["gt_cnncl_seq"]
        fa_boundary = batch["fa_boundary_seq"][0]
        return self.modules["phoneme_recognizer"].apply(
            params["phoneme_recognizer"], feats, feat_lens,
            plvl_cnnl, plvl_lens, fa_boundary, rng=stream, train=train,
        )

    def _input_feats(self, params, states, batch, stage, epoch):
        train = stage == Stage.TRAIN
        if self.hparams.get("use_kaldi_feat", False) is True:
            feats, feat_lens = batch["kaldi_feat"]
            return feats, feat_lens, dict(states)
        feats, feat_lens = batch["feat"]
        feats, norm_state = self.hparams["normalizer"].apply(
            states["normalizer"], feats, feat_lens, epoch=epoch, update=train
        )
        new_states = dict(states)
        new_states["normalizer"] = norm_state
        return feats, feat_lens, new_states

    def compute_forward(self, params, states, batch, stage, rng, epoch):
        if not hasattr(self, "target"):
            raise ValueError("target is not defined")
        target = self.target
        train = stage == Stage.TRAIN
        stream = RngStream(rng)

        feats, feat_lens, new_states = self._input_feats(
            params, states, batch, stage, epoch
        )
        predictions = {"losses": {}}

        def maybe_detach(losses, active):
            if active or not self.detach_inactive:
                return losses
            return {k: jax.lax.stop_gradient(v) for k, v in losses.items()}

        inputs = self._branch_inputs(params, feats, batch, stream, train)

        if target in (Target.PHN_RECOG, Target.VAE, Target.TEST):
            phn_out = self._phn_recog_branch(
                params, inputs["phn_in"], feat_lens, batch, stream, train
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
            phn_fc_out = self.modules[self.PHN_FC_NAME].apply(
                params[self.PHN_FC_NAME],
                jax.lax.stop_gradient(predictions["phn_recog_out"]),
            )
            rnn_in = jnp.concatenate([feat_fc_out, phn_fc_out], axis=-1)
            rnn_in = self.modules["concat_fc"].apply(
                params["concat_fc"], rnn_in
            )
            rnn_out, _ = self.modules["rnn"].apply(
                params["rnn"], rnn_in, rng=stream, train=train
            )
            pi_logits = self.modules["pi_fc"].apply(params["pi_fc"], rnn_out)
            predictions["pi_logits"] = pi_logits

            # self-training decode target (on-device DP)
            weight = float(self.hparams.get("dec_weight", 1.0))
            boundary, flvl, plvl, t_lens, l_lens = self._decode_on_device(
                predictions, batch, weight
            )
            predictions["decoded_boundary_seq"] = boundary
            predictions["decoded_flvl_md_lbl_seq"] = flvl
            predictions["decoded_plvl_md_lbl_seq"] = plvl
            predictions["decoded_t_lens"] = t_lens
            predictions["decoded_l_lens"] = l_lens

            flvl_f = flvl.astype(feats.dtype)
            decoded_onehot = jnp.stack([1 - flvl_f, flvl_f], axis=-1)
            pi_nll_loss = -D.categorical_ll_onehot(pi_logits, decoded_onehot)
            predictions["losses"]["pi_nll_loss"] = pi_nll_loss

            pi_mcmc_num = int(self.hparams["pi_mcmc_num"]) if train else 1
            acc = {k: 0.0 for k in ("vae_kld_loss", "recon_loss", "rif_loss",
                                    "entropy_loss", "baseline_loss")}
            baseline = jnp.squeeze(
                self.modules["baseline_fc"].apply(
                    params["baseline_fc"], rnn_out
                ), axis=-1,
            )  # (B, T)
            for _ in range(pi_mcmc_num):
                if train:
                    sampled = D.categorical_sample(stream.next(), pi_logits)
                else:
                    sampled = jnp.argmax(pi_logits, axis=-1)
                sampled = sampled.astype(feats.dtype)
                sampled_pi = jnp.stack([1 - sampled, sampled], axis=2)
                # same contract as MD_VAE: (B, T, 2) stacked indicator
                predictions["sampled_pi"] = sampled_pi

                enc_out = self.modules["encoder"].apply(
                    params["encoder"], rnn_out, sampled_pi,
                    rng=stream, train=train,
                )
                acc["vae_kld_loss"] += enc_out["losses"]["vae_kld_loss"]
                dec_out = self.modules["decoder"].apply(
                    params["decoder"], enc_out["sampled_h"], feats,
                    rng=stream, train=train,
                )
                acc["recon_loss"] += dec_out["losses"]["recon_loss"]

                nll = -D.categorical_ll_onehot(pi_logits, sampled_pi)
                vae_kld = jnp.mean(enc_out["losses"]["vae_kld_loss"], axis=-1)
                recon = jnp.mean(dec_out["losses"]["recon_loss"], axis=-1)
                reward = -(
                    self.hparams["recon_weight"]
                    * jax.lax.stop_gradient(recon)
                    + self.hparams["vae_kld_weight"]
                    * jax.lax.stop_gradient(vae_kld)
                    + self.hparams["pi_nll_weight"]
                    * jax.lax.stop_gradient(pi_nll_loss)
                )  # (B, T)
                acc["rif_loss"] += (
                    reward - jax.lax.stop_gradient(baseline)
                ) * nll
                acc["entropy_loss"] += -D.categorical_entropy(pi_logits)
                acc["baseline_loss"] += jnp.square(baseline - reward)

            for k in acc:
                predictions["losses"][k] = acc[k] / pi_mcmc_num

        return predictions, new_states
