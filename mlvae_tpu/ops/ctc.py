"""CTC loss, greedy decoding, and forced-alignment segmentation.

Replaces three reference dependencies:

* ``speechbrain.nnet.losses.ctc_loss`` (torch native CTC,
  ``models/CRDNN_CTC/model.py:57``) — here via ``optax.ctc_loss`` inside the
  jitted objective, with torch's ``reduction='mean'`` semantics (each
  utterance's loss divided by its label count, then batch-averaged);
* ``sb.decoders.ctc_greedy_decode`` — host-side argmax + collapse;
* the Cython ``ctc_segmentation`` package (``model.py:6,155``) — here a
  numpy Viterbi over the standard CTC topology (blank-interleaved states
  with stay/advance/skip transitions) that returns each canonical label's
  start frame, converted to a boundary indicator sequence with the
  reference's bump-right collision rule.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mlvae_tpu.utils.tensor import abs_lengths, length_mask


def ctc_loss(log_probs, targets, input_lens, target_lens, blank_index=0,
             reduction: str = "mean"):
    """SpeechBrain-signature CTC loss (relative lens), jit-safe.

    Always computed in f32 (AMP policy, same as nn/dist.py: the CTC
    forward algorithm's logsumexp chains lose alignment mass in bf16)."""
    log_probs = jnp.asarray(log_probs, jnp.float32)
    B, T, K = log_probs.shape
    L = targets.shape[1]
    in_abs = abs_lengths(input_lens, T)
    tgt_abs = abs_lengths(target_lens, L)
    logit_paddings = 1.0 - length_mask(in_abs, T, dtype=jnp.float32,
                                       absolute=True)
    label_paddings = 1.0 - length_mask(tgt_abs, L, dtype=jnp.float32,
                                       absolute=True)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, targets.astype(jnp.int32), label_paddings,
        blank_id=blank_index,
    )
    # torch/speechbrain pass zero_infinity=True: an utterance whose input is
    # too short for any CTC path (|y| + consecutive-repeat blanks > T_in,
    # common after conv time pooling) contributes loss 0 and grad 0.  optax
    # instead fills with log_epsilon-scale (~1e5) losses that would blow up
    # the batch mean, so mask infeasible utterances explicitly.
    valid = 1.0 - label_paddings
    repeats = jnp.sum(
        (targets[:, 1:] == targets[:, :-1]) * valid[:, 1:], axis=1
    )
    feasible = in_abs >= tgt_abs + repeats
    per_seq = jnp.where(feasible, per_seq, 0.0)
    if reduction == "mean":  # torch 'mean': loss_i / |y_i|, then average
        return jnp.mean(per_seq / jnp.maximum(tgt_abs, 1))
    if reduction == "batchmean":
        return jnp.mean(per_seq)
    return per_seq


def ctc_greedy_decode(probabilities, seq_lens, blank_id=0) -> List[List[int]]:
    """Host-side greedy decode: argmax -> collapse repeats -> drop blanks."""
    probs = np.asarray(probabilities)
    seq_lens = np.asarray(seq_lens)
    B, T = probs.shape[0], probs.shape[1]
    abs_lens = np.asarray(abs_lengths(seq_lens, T))
    out = []
    for i in range(B):
        # same f32 rounding as the loss path's abs_lengths — a float64
        # round here could disagree by one frame near .5 boundaries
        n = int(abs_lens[i])
        ids = probs[i, :n].argmax(-1)
        collapsed = [int(x) for j, x in enumerate(ids)
                     if (j == 0 or x != ids[j - 1]) and x != blank_id]
        out.append(collapsed)
    return out


def ctc_forced_alignment(log_probs: np.ndarray, labels: Sequence[int],
                         blank_id: int = 0) -> np.ndarray:
    """Viterbi alignment of ``labels`` to ``log_probs`` (T, K) over the CTC
    topology.  Returns each label's start frame, shape (L,)."""
    y = list(labels)
    L = len(y)
    T = log_probs.shape[0]
    S = 2 * L + 1  # blank, y0, blank, y1, ..., blank
    state_label = np.full(S, blank_id, np.int64)
    state_label[1::2] = y

    NEG = -1e30
    dp = np.full(S, NEG)
    dp[0] = log_probs[0, blank_id]
    if S > 1:
        dp[1] = log_probs[0, state_label[1]]
    # skip transition s-2 -> s allowed only into a label state whose label
    # differs from the label two states back (loop-invariant: hoisted)
    allow_skip = np.zeros(S, bool)
    allow_skip[1::2] = True
    same = np.zeros(S, bool)
    same[3::2] = state_label[3::2] == state_label[1:-2:2]
    allow_skip &= ~same

    back = np.zeros((T, S), np.int8)  # 0=stay, 1=from s-1, 2=from s-2
    for t in range(1, T):
        stay = dp
        prev1 = np.concatenate([[NEG], dp[:-1]])
        prev2 = np.concatenate([[NEG, NEG], dp[:-2]])
        prev2 = np.where(allow_skip, prev2, NEG)
        cands = np.stack([stay, prev1, prev2])
        best = cands.argmax(0)
        dp = cands.max(0) + log_probs[t, state_label]
        back[t] = best

    s = S - 1 if L == 0 or dp[S - 1] >= dp[S - 2] else S - 2
    starts = np.zeros(L, np.int64)
    path = np.zeros(T, np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = s
        if t > 0:
            s = s - back[t, s]
    for l in range(L):
        idx = np.where(path == 2 * l + 1)[0]
        starts[l] = idx[0] if len(idx) else (starts[l - 1] if l else 0)
    return starts


def ctc_segmentation_boundaries(pout: np.ndarray, labels: Sequence[int],
                                blank_id: int = 0) -> np.ndarray:
    """(T, K) log posteriors + canonical labels -> binary boundary sequence
    with the reference's conventions: the first segment starts at frame 0 and
    colliding starts bump right (``models/CRDNN_CTC/model.py:160-174``)."""
    T = pout.shape[0]
    starts = ctc_forced_alignment(pout, labels, blank_id)
    boundary = np.zeros(T, np.float32)
    for i, start in enumerate(starts):
        idx = 0 if i == 0 else int(start)
        while idx < T and boundary[idx] == 1:
            idx += 1
        if idx < T:
            boundary[idx] = 1
    return boundary
