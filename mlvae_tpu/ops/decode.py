"""MD Viterbi decoding: joint DP over (phoneme l, frame t, MD state beta).

The reference runs this DP per utterance in numpy inside a joblib fork pool —
from *inside the training forward pass* (reference ``decode_utils.py:374-565``
called at ``models/MD_VAE/model.py:133-141``), making it the dominant
non-device cost and a host<->device sync point every step.

TPU-native re-design: the whole batch decodes on device inside the jitted
step.  The forward pass is one ``lax.scan`` over time with a (B, L, 2) value
carry (every phoneme slot and MD state advances in parallel on the VPU), and
the backtrace is a second reverse ``lax.scan`` over the recorded argmax
choices.  No host callback, no fork pool, no recompile across batches.

Recurrence (same math as the reference):

    e[t, l, b]   = log p(y_l | x_t)[b] - log p(y_l)[b]          (b = MD state)
    dp[0, 0, b]  = w * log_pi[0, b] + e[0, 0, b]
    dp[l, t, b]  = max( dp[l,   t-1, b] + log_pb[t, 0] + e[t, l, b],     hold
                        dp[l-1, t-1, 0] + log_pb[t, 1] + w*log_pi[t, b] + e,
                        dp[l-1, t-1, 1] + log_pb[t, 1] + w*log_pi[t, b] + e )

with argmax order (hold, from-correct, from-incorrect) preserved so
tie-breaking matches the numpy oracle.  Probabilities are clamped at 1e-5
before the log like the reference's ``log`` helper (``decode_utils.py:8-14``).

A C++/OpenMP host decoder with identical semantics lives in
``mlvae_tpu/native`` for host-side pipelines.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_EPS = 1e-5
NEG_INF = -1e30  # avoids -inf arithmetic inside scans

# Pallas decode kernels (ops/decode_pallas.py): the two lax.scans' per-step
# while-loop dispatch dominates the decode wall time at these tiny carry
# sizes.  Hardware-validated (tools/bench_decode_pallas.py, v5e): bit-exact
# vs the scan path on-device, decode-only 1.33 → 0.93 ms at B=128 (1.42×).
# Default ON for TPU batches aligned to the kernel's 8-row sublane tile;
# MLVAE_PALLAS_DECODE=0 opts out (the scan path stays the parity oracle).
from mlvae_tpu.utils.envflags import env_bool
PALLAS_DECODE_ENABLED = env_bool("MLVAE_PALLAS_DECODE", True)


def clamped_log(x):
    return jnp.log(jnp.maximum(x, LOG_EPS))


def clamped_log_np(x):
    return np.log(np.maximum(x, LOG_EPS))


# ---------------------------------------------------------------------------
# On-device batched decoder
# ---------------------------------------------------------------------------

def build_viterbi_inputs(phn_out, boundary_v, pi_logits, prior):
    """Decoder input construction shared by the in-step self-training path
    (``MD_VAE._decode_on_device``) and the reference-signature wrapper
    below: sigmoid posteriors / prior / boundary / pi all stacked into
    [p, 1-p] pairs and clamp-logged at 1e-5 like the reference's ``log()``
    (``decode_utils.py:8-14``)."""
    p = jax.nn.sigmoid(jnp.asarray(phn_out))
    log_p_yx = clamped_log(jnp.stack([p, 1 - p], axis=3))
    prior = jnp.asarray(prior)
    log_p_y = clamped_log(jnp.stack([prior, 1 - prior], axis=1))
    bv = jnp.asarray(boundary_v)
    log_p_b = clamped_log(jnp.stack([bv, 1 - bv], axis=2))
    log_p_pi = clamped_log(jax.nn.softmax(jnp.asarray(pi_logits), axis=-1))
    return log_p_yx, log_p_y, log_p_b, log_p_pi


@jax.jit
def md_viterbi_batch(
    log_p_yx,    # (B, T, N, 2) log posteriors per MD state
    log_p_y,     # (N, 2) log prior per MD state
    y,           # (B, L) int canonical phoneme ids
    log_p_b,     # (B, T, 2) log boundary probs [boundary, no-boundary]...
    log_p_pi,    # (B, T, 2) log pi probs
    t_lens,      # (B,) int frame counts
    l_lens,      # (B,) int phoneme counts
    weight=1.0,
):
    """Returns (boundary (B,T) i32, flvl_md (B,T) i32, plvl_md (B,L) i32).

    Note ``log_p_b[..., 0]`` is log p(boundary) and ``[..., 1]`` is
    log p(no boundary) — the *hold* transition uses index 0 and the *switch*
    transition uses index 1.  That looks semantically inverted (the detector
    BCE-trains ``boundary_v`` against boundary indicators), but it is
    deliberate parity with the reference, whose hold transition scores
    ``log_p_b_i[t, 0]`` over ``p_b = stack([boundary_v, 1-boundary_v])``
    (reference ``decode_utils.py:437-465``); all implementations here
    (device scan, Pallas kernels, numpy oracle, C++ decoder) keep that
    exact convention.
    """
    if (PALLAS_DECODE_ENABLED and log_p_yx.shape[0] % 8 == 0
            and jax.default_backend() == "tpu"):
        from mlvae_tpu.ops.decode_pallas import md_viterbi_batch_pallas
        return md_viterbi_batch_pallas(log_p_yx, log_p_y, y, log_p_b,
                                       log_p_pi, t_lens, l_lens, weight)
    B, T, N, _ = log_p_yx.shape
    L = y.shape[1]
    y = y.astype(jnp.int32)
    # The DP is exact-parity-sensitive (argmax tie-breaking vs the numpy
    # oracle): always run it in f32, whatever precision the network streams.
    log_p_yx = jnp.asarray(log_p_yx, jnp.float32)
    log_p_y = jnp.asarray(log_p_y, jnp.float32)
    log_p_b = jnp.asarray(log_p_b, jnp.float32)
    log_p_pi = jnp.asarray(log_p_pi, jnp.float32)

    # emission term e[b, t, l, beta] = log_p_yx[b, t, y[b,l], beta] - log_p_y[y[b,l], beta]
    # One-hot contraction instead of take_along_axis: the (B,T,L) gather is
    # the single hottest non-recurrence op in the training step (~1.3 ms at
    # B=128 — TPU gathers are scalar-unit bound), while the equivalent
    # one-hot matmul rides the MXU.  Exact: one 1.0 per row, HIGHEST keeps
    # the f32 values un-rounded.
    onehot_y = jax.nn.one_hot(y, N, dtype=log_p_yx.dtype)  # (B, L, N)
    sel = jnp.einsum(
        "btnk,bln->btlk", log_p_yx, onehot_y,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, T, L, 2)
    prior_sel = log_p_y[y]  # (B, L, 2)
    e = sel - prior_sel[:, None, :, :]  # (B, T, L, 2)
    e_t = jnp.moveaxis(e, 1, 0)  # (T, B, L, 2)

    l_idx = jnp.arange(L)[None, :, None]  # (1, L, 1)

    dp0 = jnp.where(l_idx == 0, weight * log_p_pi[:, 0][:, None, :] + e_t[0],
                    NEG_INF)  # (B, L, 2)

    lpb_t = jnp.moveaxis(log_p_b, 1, 0)   # (T, B, 2)
    lpi_t = jnp.moveaxis(log_p_pi, 1, 0)  # (T, B, 2)
    t_range = jnp.arange(1, T)

    def fwd(dp, inputs):
        t, e_cur, lpb, lpi = inputs
        hold = dp + lpb[:, None, 0:1] + e_cur  # (B, L, 2)
        prev = jnp.concatenate(
            [jnp.full((B, 1, 2), NEG_INF, dp.dtype), dp[:, :-1, :]], axis=1
        )
        switch_base = lpb[:, None, 1:2] + weight * lpi[:, None, :] + e_cur
        from_c = prev[..., 0:1] + switch_base  # (B, L, 2)
        from_i = prev[..., 1:2] + switch_base
        cands = jnp.stack([hold, from_c, from_i], axis=0)  # (3, B, L, 2)
        dp_new = jnp.max(cands, axis=0)
        path = jnp.argmax(cands, axis=0).astype(jnp.int8)
        valid = (t < t_lens)[:, None, None]
        dp_new = jnp.where(valid, dp_new, dp)
        path = jnp.where(valid, path, 0)
        return dp_new, path

    dp_final, paths = jax.lax.scan(
        fwd, dp0, (t_range, e_t[1:], lpb_t[1:], lpi_t[1:])
    )  # paths: (T-1, B, L, 2)

    # -- backtrace -----------------------------------------------------------
    b_idx = jnp.arange(B)
    last_l = (l_lens - 1).astype(jnp.int32)  # (B,)
    dp_last = dp_final[b_idx, last_l]  # (B, 2)
    beta0 = jnp.where(dp_last[:, 0] > dp_last[:, 1], 0, 1).astype(jnp.int32)

    plvl0 = jnp.zeros((B, L), jnp.int32)
    plvl0 = plvl0.at[b_idx, last_l].set(beta0)

    def bwd(carry, inputs):
        l_cur, beta, cur_md, plvl = carry
        t, path_t = inputs  # path_t: (B, L, 2)
        p = path_t[b_idx, l_cur, beta]  # (B,)
        is_b = (p > 0).astype(jnp.int32)
        new_md = jnp.where(p == 1, 0, jnp.where(p == 2, 1, cur_md))
        l_new = l_cur - is_b
        beta_new = jnp.where(is_b == 1, new_md, beta)
        plvl = jnp.where(
            (is_b == 1)[:, None]
            & (jnp.arange(L)[None, :] == l_new[:, None]),
            new_md[:, None], plvl,
        )
        # emit: boundary flag for frame t, md label for frame t-1
        return (l_new, beta_new, new_md, plvl), (is_b, new_md)

    (l_end, _, md_end, plvl), (b_flags, md_emits) = jax.lax.scan(
        bwd, (last_l, beta0, beta0, plvl0),
        (t_range, paths), reverse=True,
    )  # emits indexed by t = 1..T-1

    boundary = jnp.zeros((B, T), jnp.int32)
    boundary = boundary.at[:, 1:].set(jnp.moveaxis(b_flags, 0, 1))
    boundary = boundary.at[:, 0].set(1)

    flvl = jnp.zeros((B, T), jnp.int32)
    # md_emits[t-1] is the label for frame t-1; frame T-1's label was emitted
    # at the first invalid step (or is beta0 when T == t_lens == T max).
    flvl = flvl.at[:, :-1].set(jnp.moveaxis(md_emits, 0, 1))
    last_t = (t_lens - 1).astype(jnp.int32)
    # label for the final valid frame = beta chosen at the end of the lattice
    flvl = flvl.at[b_idx, last_t].set(beta0)

    return boundary, flvl, plvl


# ---------------------------------------------------------------------------
# Exact numpy oracle (host fallback; vectorized over l)
# ---------------------------------------------------------------------------

def md_viterbi_np(log_p_yx, log_p_y, y, log_p_b, log_p_pi, T_i, L_i,
                  weight=1.0):
    """Single-utterance decode; same recurrence/tie-breaking as the device
    version.  Returns (boundary (T_i,), flvl (T_i,), plvl (L_i,))."""
    y = np.asarray(y[:L_i], np.int64)
    e = log_p_yx[:T_i, y, :] - log_p_y[y][None]  # (T, L, 2)
    dp = np.full((L_i, 2), -np.inf)
    dp[0] = weight * log_p_pi[0] + e[0, 0]
    paths = np.zeros((T_i, L_i, 2), np.int8)
    for t in range(1, T_i):
        hold = dp + log_p_b[t, 0] + e[t]
        prev = np.vstack([np.full((1, 2), -np.inf), dp[:-1]])
        switch_base = log_p_b[t, 1] + weight * log_p_pi[t][None, :] + e[t]
        from_c = prev[:, 0:1] + switch_base
        from_i = prev[:, 1:2] + switch_base
        cands = np.stack([hold, from_c, from_i], axis=0)
        dp = cands.max(axis=0)
        paths[t] = cands.argmax(axis=0)

    l, t = L_i - 1, T_i - 1
    beta = 0 if dp[l, 0] > dp[l, 1] else 1
    boundary_idx = []
    flvl = [beta]
    plvl = [beta]
    while t > 0:
        p = paths[t, l, beta]
        if p == 1:
            l -= 1
            boundary_idx.append(t)
            flvl.append(0)
            plvl.append(0)
            beta = 0
        elif p == 2:
            l -= 1
            boundary_idx.append(t)
            flvl.append(1)
            plvl.append(1)
            beta = 1
        else:
            flvl.append(flvl[-1])
        t -= 1
    boundary_idx.append(0)
    assert l == 0 and t == 0, (l, t)
    flvl.reverse()
    plvl.reverse()
    boundary = np.zeros(T_i, np.int64)
    boundary[boundary_idx] = 1
    assert boundary.sum() == L_i
    return boundary, np.asarray(flvl), np.asarray(plvl)


# ---------------------------------------------------------------------------
# Reference-compatible batch API
# ---------------------------------------------------------------------------

def decode_plvl_md_lbl_seqs_full(
    predictions: Dict,
    utt_ids,
    feat_lens,
    plvl_cnnl_seqs,
    plvl_cnnl_seq_lens,
    prior,
    weight: float = 1.0,
) -> Tuple[List, List, List]:
    """Drop-in equivalent of reference ``decode_utils.py:374`` — same inputs
    (model predictions dict with ``phn_recog_out``/``boundary_v``/
    ``pi_logits``), same three lists out — but decoding runs batched on
    device instead of one joblib process per utterance.
    """
    from mlvae_tpu.utils.tensor import abs_lengths

    phn_out = jnp.asarray(predictions["phn_recog_out"])
    B, T, N = phn_out.shape
    t_lens = abs_lengths(jnp.asarray(feat_lens), T)
    L = plvl_cnnl_seqs.shape[1]
    l_lens = abs_lengths(jnp.asarray(plvl_cnnl_seq_lens), L)

    log_p_yx, log_p_y, log_p_b, log_p_pi = build_viterbi_inputs(
        phn_out, predictions["boundary_v"], predictions["pi_logits"], prior
    )

    boundary, flvl, plvl = md_viterbi_batch(
        log_p_yx, log_p_y, jnp.asarray(plvl_cnnl_seqs).astype(jnp.int32),
        log_p_b, log_p_pi, t_lens, l_lens, weight,
    )
    boundary = np.asarray(boundary)
    flvl = np.asarray(flvl)
    plvl = np.asarray(plvl)
    t_lens = np.asarray(t_lens)
    l_lens = np.asarray(l_lens)
    return (
        [boundary[i, : t_lens[i]] for i in range(B)],
        [list(flvl[i, : t_lens[i]]) for i in range(B)],
        [list(plvl[i, : l_lens[i]]) for i in range(B)],
    )


# ---------------------------------------------------------------------------
# Legacy two-pass decoders (component parity with decode_utils.py:17-188)
# ---------------------------------------------------------------------------

def decode_boundary(eval_outputs, utt_ids, lens, can_seqs, can_seq_lens,
                    prior, **kwargs) -> Dict[str, np.ndarray]:
    """Boundary-only DP over (l, t): hold vs advance, scored by recognizer
    posterior ratio and boundary probability (reference
    ``decode_utils.py:17-111``)."""
    p_yx = jax.nn.sigmoid(jnp.asarray(eval_outputs["phoneme_ret"]))
    log_p_yx = np.asarray(clamped_log(p_yx))
    y = np.argmax(np.asarray(can_seqs), axis=-1)
    bb = np.asarray(eval_outputs["boundary_beta"])
    log_p_b = clamped_log_np(np.stack([bb, 1 - bb], axis=2))
    log_p_y = clamped_log_np(np.asarray(prior))

    out = {}
    for i, utt_id in enumerate(utt_ids):
        T_i, L_i = int(lens[i]), int(can_seq_lens[i])
        y_i = y[i, :L_i]
        em = log_p_yx[i, :T_i][:, y_i] - log_p_y[y_i][None]  # (T, L)
        dp = np.full(L_i, -np.inf)
        dp[0] = em[0, 0]
        path = np.zeros((T_i, L_i), np.int8)
        for t in range(1, T_i):
            hold = dp + log_p_b[i, t, 0] + em[t]
            adv = np.concatenate([[-np.inf], dp[:-1]]) + log_p_b[i, t, 1] + em[t]
            path[t] = (adv >= hold).astype(np.int8)
            path[t, 0] = 0
            dp = np.maximum(hold, adv)
        l, t = L_i - 1, T_i - 1
        idx = []
        while t > 0:
            if path[t, l] == 1:
                l -= 1
                idx.append(t)
            t -= 1
        idx.append(0)
        seq = np.zeros(T_i, int)
        seq[idx] = 1
        assert seq.sum() == L_i
        out[utt_id] = seq
    return out


def decode_phoneme_mdd_conditional(eval_outputs, utt_ids, lens, can_seqs,
                                   can_seq_lens, prior, **kwargs):
    """Per-segment MD classification given decoded boundaries (reference
    ``decode_utils.py:114-188``): sum the per-frame posterior-ratio evidence
    inside each segment and pick the larger hypothesis."""
    p = jax.nn.sigmoid(jnp.asarray(eval_outputs["phoneme_ret"]))
    log_p_yx = np.asarray(clamped_log(jnp.stack([p, 1 - p], axis=3)))
    prior = np.asarray(prior)
    log_py = clamped_log_np(np.stack([prior, 1 - prior], axis=1))
    y = np.argmax(np.asarray(can_seqs), axis=-1)
    decoded = eval_outputs["decoded_boundaries"]

    ret = np.zeros_like(y)
    for i, utt_id in enumerate(utt_ids):
        T_i = int(lens[i])
        starts = np.where(decoded[utt_id] == 1)[0]
        ends = np.concatenate([starts[1:], [T_i]])
        for j, (s, epos) in enumerate(zip(starts, ends)):
            y_ij = y[i, j]
            lc = log_p_yx[i, s:epos, y_ij, 0].sum() - log_py[y_ij, 0] * (epos - s)
            lm = log_p_yx[i, s:epos, y_ij, 1].sum() - log_py[y_ij, 1] * (epos - s)
            if lm > lc:
                ret[i, j] = 1
    return ret
