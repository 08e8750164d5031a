"""Pallas TPU kernel: fused log-mel filterbank compute stage.

The XLA path (``mlvae_tpu.ops.fbank``) expresses the DFT as two matmuls, but
XLA cannot fuse matmul -> elementwise -> matmul chains: the (T, 257) real /
imag / power intermediates round-trip through HBM.  This kernel keeps the
whole chain per frame-block resident in VMEM:

    frames (blockT, 512)  --VPU-->  dc-removal, pre-emphasis, Hamming window
                          --MXU-->  re = f @ C,  im = f @ S      (512 x 257)
                          --VPU-->  power = re^2 + im^2
                          --MXU-->  mel = power @ M              (257 x n_mels)
                          --VPU-->  log(max(mel, eps))

Framing (the strided gather with snip-edges reflection) stays in XLA where
the compiler already emits an efficient batched gather; this kernel covers
the FLOP-heavy stage.  Semantics identical to
``mlvae_tpu.ops.frontend_ref.kaldi_fbank`` (tested to 1e-4).

Kernel structure follows the Pallas TPU guide: 128-row frame blocks (f32
sublane multiple), lane-major (…, 512) layouts, constants as unblocked VMEM
inputs, ``preferred_element_type=float32`` on every MXU op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlvae_tpu.ops import frontend_ref as ref
from mlvae_tpu.ops.fbank import (kaldi_frame_counts, kaldi_frame_gather,
                                 _dft_matrices, _kaldi_consts)

_BLOCK_T = 128


def _fbank_kernel(frames_ref, cos_ref, sin_ref, mel_ref, win_ref, out_ref,
                  *, window: int):
    f = frames_ref[:]  # (blockT, Wpad) — cols >= window are zero
    inv_w = 1.0 / float(window)

    # remove_dc_offset over the valid columns only
    mean = jnp.sum(f, axis=1, keepdims=True) * inv_w
    col = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1)
    valid = (col < window).astype(f.dtype)
    f = f - mean * valid

    # pre-emphasis: x[j] -= 0.97 * x[j-1], with x[0] -= 0.97 * x[0]
    shifted = pltpu.roll(f, 1, 1)
    shifted = jnp.where(col == 0, f, shifted)
    f = f - 0.97 * shifted

    # Hamming window (zero beyond the valid columns)
    f = f * win_ref[:]

    hi = jax.lax.Precision.HIGHEST  # full f32 MXU passes; bf16 default
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:] = jnp.log(jnp.maximum(mel, ref.EPS_F32))


@functools.partial(
    jax.jit, static_argnames=("sr", "shift", "window", "n_mels", "max_frames",
                              "interpret")
)
def kaldi_fbank_pallas(
    waves: jnp.ndarray,    # (B, Lmax) float32
    lengths: jnp.ndarray,  # (B,) int32
    *,
    sr: int = 16000,
    shift: int = 320,
    window: int = 400,
    n_mels: int = 40,
    max_frames: int,
    interpret: bool = False,
):
    """Kaldi-semantics log-mel via the fused Pallas kernel.

    Same contract as ``kaldi_fbank_batch``: ((B, max_frames, n_mels), (B,)).
    """
    padded = ref.next_pow2(window)
    n_bins_c = padded // 2 + 1
    # full padded-width DFT matrices: frames carry a zero tail beyond
    # `window`, so the extra rows contribute nothing
    cos_m, sin_m = _dft_matrices(padded, padded, n_bins_c)
    banks = ref.kaldi_mel_banks(n_mels, padded, sr).T.astype(np.float32)
    B, Lmax = waves.shape
    n_frames = kaldi_frame_counts(lengths, shift)

    # XLA framing gather with snip-edges=false reflection (shared helper)
    frames = kaldi_frame_gather(waves, lengths, max_frames, shift, window)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - window)))

    # flatten to (rows, padded) with rows a multiple of the block size
    rows = B * max_frames
    rows_pad = ((rows + _BLOCK_T - 1) // _BLOCK_T) * _BLOCK_T
    frames2d = jnp.pad(frames.reshape(rows, padded),
                       ((0, rows_pad - rows), (0, 0)))

    # window vector (single source of truth: fbank._kaldi_consts),
    # zero-extended to the padded width
    win = np.zeros((padded,), np.float32)
    win[:window] = _kaldi_consts(sr, window, n_mels)[3]
    win2d = jnp.asarray(np.broadcast_to(win, (_BLOCK_T, padded)))

    n_bins = padded // 2 + 1
    grid = (rows_pad // _BLOCK_T,)
    out = pl.pallas_call(
        functools.partial(_fbank_kernel, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_T, padded), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((padded, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((padded, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_T, padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_T, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * padded * n_bins * 2
            + 2 * rows_pad * n_bins * n_mels,
            bytes_accessed=rows_pad * (padded + n_mels) * 4,
            transcendentals=rows_pad * n_mels,
        ),
        interpret=interpret,
    )(frames2d, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(banks),
      win2d)

    logmel = out[:rows].reshape(B, max_frames, n_mels)
    valid = (jnp.arange(max_frames)[None, :] < n_frames[:, None])
    return logmel * valid[..., None], n_frames
