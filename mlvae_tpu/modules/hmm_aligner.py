"""HMM forced aligner (YAML alias of ``speechbrain.alignment.aligner.HMMAligner``
as the reference's HMM_DNN_ALI recipe uses it, ``models/HMM_DNN_ALI/model.yaml:53-57``).

Left-to-right HMM with ``states_per_phoneme`` states per phoneme and
stay/advance transitions.  TPU-native split:

* the FORWARD score (the differentiable training loss, reference
  ``model.py:64-68``) is a ``lax.scan`` log-sum-exp recursion, batched and
  jit-safe so it can live inside the fused train step;
* VITERBI alignment (targets/diagnostics, no gradients) runs host-side in
  numpy with backtracking, plus an alignment store for the
  viterbi-training round trip (``model.py:74-86``).
"""
from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.utils.tensor import abs_lengths

NEG = -1e30


class HMMAligner:
    def __init__(self, states_per_phoneme: int = 3,
                 batch_reduction: str = "mean",
                 input_len_norm: bool = True,
                 target_len_norm: bool = False,
                 hop_samples: int = 320, **kwargs):
        self.states_per_phoneme = int(states_per_phoneme)
        self.batch_reduction = batch_reduction
        self.input_len_norm = input_len_norm
        self.target_len_norm = target_len_norm
        # frame hop in samples for calc_accuracy's end->frame conversion
        # (default 20 ms @ 16 kHz; recipes with other hops must pass theirs)
        self.hop_samples = int(hop_samples)
        self.align_dict: Dict[str, np.ndarray] = {}

    # -- state expansion ------------------------------------------------------
    def expand_phns_by_states_per_phoneme(self, phns, phn_lens):
        """(B, L) phoneme ids -> (B, L*S) HMM state ids (p*S .. p*S+S-1)."""
        S = self.states_per_phoneme
        phns = jnp.asarray(phns, jnp.int32)
        states = phns[:, :, None] * S + jnp.arange(S)[None, None, :]
        return states.reshape(phns.shape[0], -1)

    # -- forward / viterbi ------------------------------------------------------
    def __call__(self, pout, pout_lens, states, state_rel_lens, mode):
        if mode == "forward":
            return self.forward_score(pout, pout_lens, states, state_rel_lens)
        if mode == "viterbi":
            return self.viterbi(pout, pout_lens, states, state_rel_lens)
        raise ValueError(f"unknown mode: {mode}")

    def forward_score(self, pout, pout_lens, states, state_rel_lens):
        """Batched differentiable forward algorithm.  Returns the batch score
        (reduced per ``batch_reduction``)."""
        B, T, K = pout.shape
        Smax = states.shape[1]
        S = self.states_per_phoneme
        t_lens = abs_lengths(jnp.asarray(pout_lens), T)
        s_lens = abs_lengths(jnp.asarray(state_rel_lens),
                             states.shape[1] // S) * S

        emis = jnp.take_along_axis(
            pout[:, :, :], jnp.broadcast_to(
                states[:, None, :], (B, T, Smax)
            ), axis=2,
        )  # (B, T, Smax) log p(state s emits frame t)
        emis_t = jnp.moveaxis(emis, 1, 0)

        alpha0 = jnp.where(jnp.arange(Smax)[None, :] == 0, emis_t[0], NEG)

        def step(alpha, inputs):
            t, e = inputs
            prev = jnp.concatenate(
                [jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1
            )
            new = jnp.logaddexp(alpha, prev) + e
            valid = (t < t_lens)[:, None]
            return jnp.where(valid, new, alpha), None

        alpha, _ = jax.lax.scan(
            step, alpha0, (jnp.arange(1, T), emis_t[1:])
        )
        scores = jnp.take_along_axis(
            alpha, (s_lens - 1)[:, None], axis=1
        )[:, 0]
        if self.input_len_norm:
            scores = scores / t_lens
        if self.target_len_norm:
            scores = scores / jnp.maximum(s_lens, 1)
        if self.batch_reduction == "mean":
            return jnp.mean(scores)
        if self.batch_reduction == "sum":
            return jnp.sum(scores)
        return scores

    def viterbi(self, pout, pout_lens, states, state_rel_lens):
        """Host-side max-product alignment.  Returns (scores, alignments):
        per-utterance best path of HMM state ids, trimmed to true length."""
        pout = np.asarray(pout)
        states = np.asarray(states)
        B, T, K = pout.shape
        S = self.states_per_phoneme
        t_lens = np.asarray(abs_lengths(jnp.asarray(pout_lens), T))
        s_lens = np.asarray(
            abs_lengths(jnp.asarray(state_rel_lens), states.shape[1] // S)
        ) * S

        scores = np.zeros(B, np.float32)
        alignments: List[np.ndarray] = []
        for b in range(B):
            T_b, S_b = int(t_lens[b]), int(s_lens[b])
            st = states[b, :S_b]
            emis = pout[b, :T_b][:, st]  # (T_b, S_b)
            dp = np.full(S_b, NEG)
            dp[0] = emis[0, 0]
            back = np.zeros((T_b, S_b), np.int8)
            for t in range(1, T_b):
                prev = np.concatenate([[NEG], dp[:-1]])
                adv = prev > dp
                back[t] = adv.astype(np.int8)
                dp = np.where(adv, prev, dp) + emis[t]
            s = S_b - 1
            path = np.zeros(T_b, np.int64)
            for t in range(T_b - 1, -1, -1):
                path[t] = st[s]
                if t > 0:
                    s -= int(back[t, s])
            score = dp[S_b - 1]
            if self.input_len_norm:
                score = score / max(T_b, 1)
            if self.target_len_norm:
                score = score / max(S_b, 1)
            scores[b] = score
            alignments.append(path)
        # same reduction contract as forward_score
        if self.batch_reduction == "mean":
            red = np.mean(scores)
        elif self.batch_reduction == "sum":
            red = np.sum(scores)
        else:
            red = scores
        return red, alignments

    # -- alignment store (viterbi-training round trip) --------------------------
    def store_alignments(self, ids, alignments):
        for utt_id, ali in zip(ids, alignments):
            self.align_dict[utt_id] = np.asarray(ali)

    def get_prev_alignments(self, ids, pout, pout_lens, states, state_lens):
        """Previous alignments as NLL targets; falls back to a uniform
        left-to-right split for unseen utterances (like SpeechBrain)."""
        pout = np.asarray(pout)
        B, T, K = pout.shape
        t_lens = np.asarray(abs_lengths(jnp.asarray(pout_lens), T))
        states = np.asarray(states)
        S = self.states_per_phoneme
        s_lens = np.asarray(
            abs_lengths(jnp.asarray(state_lens), states.shape[1] // S)
        ) * S
        out = np.zeros((B, T), np.int64)
        for b, utt_id in enumerate(ids):
            T_b, S_b = int(t_lens[b]), int(s_lens[b])
            if utt_id in self.align_dict:
                ali = self.align_dict[utt_id][:T_b]
            else:
                idx = np.minimum(
                    (np.arange(T_b) * S_b) // max(T_b, 1), S_b - 1
                )
                ali = states[b, idx]
            out[b, :len(ali)] = ali
        return out

    # -- accuracy metric ---------------------------------------------------------
    def calc_accuracy(self, alignments, ends, phns):
        """Per-utterance frame accuracy of the aligned phoneme sequence vs
        the ground-truth segmentation (ends in samples, converted to frames
        with ``hop_samples``)."""
        S = self.states_per_phoneme
        hop = self.hop_samples
        accs = []
        for ali, end_seq, phn_seq in zip(alignments, ends, phns):
            ali = np.asarray(ali)
            T = len(ali)
            aligned_phn = ali // S
            gt = np.zeros(T, np.int64)
            end_frames = [min(int(e) // hop, T) for e in np.asarray(end_seq)]
            start = 0
            for phn, end in zip(np.asarray(phn_seq).reshape(-1), end_frames):
                gt[start:end] = int(phn)
                start = end
            accs.append(float((aligned_phn == gt).mean()) * 100
                        if T else 0.0)
        return accs
