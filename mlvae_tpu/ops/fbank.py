"""Fused XLA log-mel front-end (Kaldi-compat and SpeechBrain-compat modes).

TPU-first replacement for BOTH of the reference's feature paths:

* the four Kaldi subprocess stages (fbank -> add-deltas -> cmvn-stats ->
  apply-cmvn, reference ``utils/data_io_utils.py:99-206``), and
* the in-graph SpeechBrain ``Fbank`` (reference ``config/run.yaml:39-44``).

Design: framing is a batched gather; the DFT is expressed as two matmuls
against precomputed cos/sin matrices ((W, n_bins), shared across frames) so
the FLOPs land on the MXU and XLA fuses window/pre-emphasis/power/mel/log
around them; the whole front-end compiles into one fused kernel per bucket
shape.  A hand-written Pallas version of the same pipeline lives in
``mlvae_tpu.ops.fbank_pallas``.

Numerical parity gate: tests compare against the numpy golden oracle in
``mlvae_tpu.ops.frontend_ref`` at <=1e-4 rel-err (BASELINE.md).
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.ops import frontend_ref as ref


# ---------------------------------------------------------------------------
# constant builders (host, numpy, cached)
# ---------------------------------------------------------------------------

# NOTE: these return numpy arrays (not jnp) so they are safe to build lazily
# inside a jit trace; XLA lifts them as compile-time constants.

@functools.lru_cache(maxsize=None)
def _dft_matrices(window: int, padded: int, n_bins: int):
    j = np.arange(window)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * j * k / padded
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _kaldi_consts(sr: int, window: int, n_mels: int):
    padded = ref.next_pow2(window)
    n_bins = padded // 2 + 1
    cos_m, sin_m = _dft_matrices(window, padded, n_bins)
    banks = ref.kaldi_mel_banks(n_mels, padded, sr).T.astype(np.float32)
    n = np.arange(window)
    ham = (0.54 - 0.46 * np.cos(2 * np.pi * n / (window - 1))).astype(np.float32)
    return cos_m, sin_m, banks, ham


@functools.lru_cache(maxsize=None)
def _sb_consts(sr: int, n_fft: int, n_mels: int):
    n_bins = n_fft // 2 + 1
    cos_m, sin_m = _dft_matrices(n_fft, n_fft, n_bins)
    banks = ref.sb_mel_banks(n_mels, n_fft, sr).T.astype(np.float32)
    n = np.arange(n_fft)
    ham = (0.54 - 0.46 * np.cos(2 * np.pi * n / n_fft)).astype(np.float32)
    return cos_m, sin_m, banks, ham


# ---------------------------------------------------------------------------
# Kaldi-compatible path
# ---------------------------------------------------------------------------

def kaldi_frame_counts(lengths, shift: int):
    return (lengths + shift // 2) // shift


def kaldi_frame_gather(waves, lengths, max_frames: int, shift: int,
                       window: int):
    """Snip-edges=false framing: centered frames with edge reflection.

    Shared by the XLA and Pallas fbank paths (single source of truth for the
    reflection semantics).  waves (B, Lmax), lengths (B,) ->
    frames (B, max_frames, window).
    """
    B, Lmax = waves.shape
    t = jnp.arange(max_frames)[:, None]
    j = t * shift + shift // 2 - window // 2 + jnp.arange(window)[None, :]
    j = jnp.broadcast_to(j, (B, max_frames, window))
    L = lengths[:, None, None]
    # Kaldi reflects iteratively (while s<0 or s>=L: s = s<0 ? -s-1 : 2L-1-s),
    # which is periodic with period 2L; the closed form below matches it for
    # every index, including utterances shorter than half a window where a
    # single reflection pass would leave out-of-range indices
    two_l = jnp.maximum(2 * L, 1)
    m = jnp.mod(j, two_l)
    j = jnp.where(m >= L, 2 * L - 1 - m, m)
    j = jnp.clip(j, 0, Lmax - 1)
    return jnp.take_along_axis(
        waves[:, None, :], j.reshape(B, -1)[:, None, :], axis=2
    ).reshape(B, max_frames, window)


@functools.partial(
    jax.jit, static_argnames=("sr", "shift", "window", "n_mels", "max_frames")
)
def kaldi_fbank_batch(
    waves: jnp.ndarray,      # (B, Lmax) float32
    lengths: jnp.ndarray,    # (B,) int32 true sample counts
    *,
    sr: int = 16000,
    shift: int = 320,
    window: int = 400,
    n_mels: int = 40,
    max_frames: int,
):
    """Batched Kaldi-semantics log-mel: returns ((B, max_frames, n_mels),
    (B,) frame counts).  Frames beyond a sample's count are zeroed."""
    cos_m, sin_m, banks, ham = _kaldi_consts(sr, window, n_mels)
    n_frames = kaldi_frame_counts(lengths, shift)  # (B,)
    frames = kaldi_frame_gather(waves, lengths, max_frames, shift, window)

    frames = frames - frames.mean(axis=-1, keepdims=True)  # remove_dc_offset
    shifted = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - 0.97 * shifted                        # pre-emphasis
    frames = frames * ham

    re = jnp.einsum("btw,wk->btk", frames, cos_m,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btw,wk->btk", frames, sin_m,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    mel = jnp.einsum("btk,km->btm", power, banks,
                     preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log(jnp.maximum(mel, ref.EPS_F32))

    valid = (jnp.arange(max_frames)[None, :] < n_frames[:, None])
    return logmel * valid[..., None], n_frames


@functools.partial(jax.jit, static_argnames=("order", "window"))
def deltas_batch(feats, n_frames, order: int = 2, window: int = 2):
    """Kaldi ``add-deltas``: composite delta filters over the original
    features, indices clamped at each utterance's true frame count
    (exact Kaldi DeltaFeatures semantics; see
    ``frontend_ref.kaldi_delta_scales``).  (B, T, C) -> (B, T, C*(order+1))."""
    from mlvae_tpu.ops.frontend_ref import kaldi_delta_scales

    B, T, C = feats.shape
    idx = jnp.arange(T)[None, :]
    last = (n_frames - 1)[:, None]
    outs = []
    for sc in kaldi_delta_scales(order, window):
        off = (len(sc) - 1) // 2
        acc = jnp.zeros_like(feats)
        for j in range(-off, off + 1):
            if sc[j + off] == 0.0:
                continue
            tj = jnp.clip(jnp.minimum(idx + j, last), 0, None).astype(
                jnp.int32)
            acc = acc + sc[j + off] * jnp.take_along_axis(
                feats, tj[..., None], axis=1)
        outs.append(acc)
    # re-mask: padding frames t >= n_frames would otherwise carry nonzero
    # garbage from clamped real-frame reads
    valid = (idx < n_frames[:, None])[..., None]
    return jnp.concatenate(outs, axis=-1) * valid


def cmvn_apply(feats, mean, std):
    return (feats - mean) / std


# ---------------------------------------------------------------------------
# SpeechBrain-compatible path
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("sr", "hop", "n_fft", "n_mels", "max_frames", "deltas"),
)
def sb_fbank_batch(
    waves: jnp.ndarray,    # (B, Lmax)
    lengths: jnp.ndarray,  # (B,) int32
    *,
    sr: int = 16000,
    hop: int = 320,
    n_fft: int = 400,
    n_mels: int = 40,
    max_frames: int,
    deltas: bool = False,
):
    """Batched SpeechBrain-semantics dB log-mel (+optional deltas)."""
    cos_m, sin_m, banks, ham = _sb_consts(sr, n_fft, n_mels)
    B, Lmax = waves.shape
    pad = n_fft // 2
    n_frames = lengths // hop + 1

    t = jnp.arange(max_frames)[:, None]
    j = t * hop - pad + jnp.arange(n_fft)[None, :]  # center=True, constant pad
    j = jnp.broadcast_to(j, (B, max_frames, n_fft))
    L = lengths[:, None, None]
    inside = (j >= 0) & (j < L)
    jc = jnp.clip(j, 0, Lmax - 1)
    frames = jnp.take_along_axis(
        waves[:, None, :], jc.reshape(B, -1)[:, None, :], axis=2
    ).reshape(B, max_frames, n_fft)
    frames = jnp.where(inside, frames, 0.0) * ham

    re = jnp.einsum("btw,wk->btk", frames, cos_m,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("btw,wk->btk", frames, sin_m,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    mel = jnp.einsum("btk,km->btm", power, banks,
                     preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

    valid = (jnp.arange(max_frames)[None, :] < n_frames[:, None])
    # top_db clamp relative to each utterance's max over valid frames
    masked = jnp.where(valid[..., None], db, -jnp.inf)
    db_max = masked.max(axis=(1, 2), keepdims=True)
    db = jnp.maximum(db, db_max - 80.0)

    if deltas:
        d1 = deltas_batch(db, n_frames, order=1)[..., n_mels:]
        d2 = deltas_batch(d1, n_frames, order=1)[..., n_mels:]
        db = jnp.concatenate([db, d1, d2], axis=-1)

    return db * valid[..., None], n_frames


# ---------------------------------------------------------------------------
# YAML-visible feature extractor
# ---------------------------------------------------------------------------

def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class Fbank:
    """YAML-visible alias of ``speechbrain.lobes.features.Fbank``.

    Called by the data pipeline per utterance
    (``hparams['compute_features'](batched_wav)``, reference
    ``utils/data_io.py:198``).  Pads waveforms to 0.5 s buckets so XLA
    compiles one kernel per bucket instead of one per utterance length.
    """

    def __init__(self, deltas: bool = False, sample_rate: int = 16000,
                 hop_length: float = 20.0, n_fft: int = 400, n_mels: int = 40,
                 **kwargs):
        self.deltas = bool(deltas)
        self.sample_rate = int(sample_rate)
        self.hop = int(sample_rate * hop_length / 1000)
        self.n_fft = int(n_fft)
        self.n_mels = int(n_mels)
        self.bucket = self.sample_rate // 2

    def __call__(self, waves, lengths=None):
        waves = jnp.atleast_2d(jnp.asarray(waves, jnp.float32))
        B, L = waves.shape
        if lengths is None:
            lengths = jnp.full((B,), L, jnp.int32)
        Lpad = _round_up(max(L, self.bucket), self.bucket)
        waves = jnp.pad(waves, ((0, 0), (0, Lpad - L)))
        max_frames = Lpad // self.hop + 1
        feats, n_frames = sb_fbank_batch(
            waves, jnp.asarray(lengths, jnp.int32),
            sr=self.sample_rate, hop=self.hop, n_fft=self.n_fft,
            n_mels=self.n_mels, max_frames=max_frames, deltas=self.deltas,
        )
        # frame count from host-side lengths — never a device fetch
        # (each fetch costs ~30 ms tunnel RTT on this setup)
        true_frames = int(np.max(np.asarray(lengths))) // self.hop + 1
        return feats[:, :true_frames]


class KaldiFbank:
    """Kaldi-pipeline-equivalent extractor (fbank+deltas), per utterance.

    Replaces the reference's ``compute-fbank-feats``/``add-deltas``
    subprocesses; speaker-level CMVN is applied by the dataset layer which
    owns the utt2spk mapping (see ``mlvae_tpu.data.features``).
    """

    def __init__(self, sample_rate: int = 16000, hop_length: float = 20.0,
                 n_fft: int = 400, n_mels: int = 40, deltas: bool = True,
                 **kwargs):
        self.sample_rate = int(sample_rate)
        self.shift = int(sample_rate * hop_length / 1000)
        self.window = int(n_fft)  # reference passes n_fft as frame length
        self.n_mels = int(n_mels)
        self.deltas = bool(deltas)
        self.bucket = self.sample_rate // 2

    def __call__(self, waves, lengths=None):
        waves = jnp.atleast_2d(jnp.asarray(waves, jnp.float32))
        B, L = waves.shape
        if lengths is None:
            lengths = jnp.full((B,), L, jnp.int32)
        Lpad = _round_up(max(L, self.bucket), self.bucket)
        waves = jnp.pad(waves, ((0, 0), (0, Lpad - L)))
        max_frames = int(kaldi_frame_counts(Lpad, self.shift))
        feats, n_frames = kaldi_fbank_batch(
            waves, jnp.asarray(lengths, jnp.int32),
            sr=self.sample_rate, shift=self.shift, window=self.window,
            n_mels=self.n_mels, max_frames=max_frames,
        )
        if self.deltas:
            feats = deltas_batch(feats, n_frames)
        true_frames = int(kaldi_frame_counts(
            int(np.max(np.asarray(lengths))), self.shift))
        return feats[:, :true_frames]
