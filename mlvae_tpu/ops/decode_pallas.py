"""Pallas TPU kernels for the in-step MD Viterbi decode.

``ops/decode.md_viterbi_batch`` runs the DP as two ``lax.scan``s over time
(forward lattice + reverse backtrace).  The per-step math is tiny — a
(B, L, 2) carry with L ≈ 8 — so at T ≈ 160 the XLA while-loop's per-step
dispatch overhead dominates the decode's wall time (the step's HBM traffic
is negligible, docs/PERF.md).  These kernels run each scan as one Mosaic
program over a sequential time grid, with the DP carry resident in VMEM —
the same latency cure the Pallas LSTM recurrence applies.

Semantics are EXACTLY ``md_viterbi_batch``'s (same candidate order and
first-max tie-breaking, same validity masking, same emission layout), and
``tests/test_decode_pallas.py`` locks the kernels against it and the numpy
oracle.  Two Mosaic-specific re-expressions of the math:

* the phoneme-axis shift ``dp[:, l-1]`` is a (BB, L) x (L, L) subdiagonal
  matmul plus a NEG_INF mask on l = 0 (lane-axis slicing by 1 is not a
  Mosaic-friendly op; the tiny MXU dot is);
* the backtrace's per-sample gather ``path[b, l_cur[b], beta[b]]`` is a
  one-hot contraction over the L lanes.

Opt-in via ``MLVAE_PALLAS_DECODE=1`` (consumed by ``ops/decode``) until
validated on hardware; ``tools/bench_decode_pallas.py`` A/Bs both paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlvae_tpu.ops.decode import NEG_INF


def _fwd_kernel(e0_ref, e1_ref, lpb0_ref, lpb1_ref, lpi0_ref, lpi1_ref,
                tlen_ref, shift_ref,
                path0_ref, path1_ref, dpf0_ref, dpf1_ref,
                dp0_scr, dp1_scr, *, L: int):
    t = pl.program_id(1)

    e0 = e0_ref[0]            # (BB, L)
    e1 = e1_ref[0]
    lpb0 = lpb0_ref[0]        # (BB, 1)
    lpb1 = lpb1_ref[0]
    lpi0 = lpi0_ref[0]
    lpi1 = lpi1_ref[0]

    @pl.when(t == 0)
    def _():
        # dp[0, l, beta] = w*log_pi[0, beta] + e[0, 0, beta] at l == 0,
        # NEG_INF elsewhere (decode.md_viterbi_batch dp0); the weight is
        # already folded into lpi by the wrapper (it can be a tracer —
        # md_viterbi_batch is jitted — so it cannot be a kernel constant)
        l_is0 = (jax.lax.broadcasted_iota(jnp.int32, (dp0_scr.shape[0], L),
                                          1) == 0)
        dp0_scr[:] = jnp.where(l_is0, lpi0 + e0, NEG_INF)
        dp1_scr[:] = jnp.where(l_is0, lpi1 + e1, NEG_INF)
        path0_ref[0] = jnp.zeros_like(path0_ref[0])
        path1_ref[0] = jnp.zeros_like(path1_ref[0])

    @pl.when(t > 0)
    def _():
        dp0 = dp0_scr[:]
        dp1 = dp1_scr[:]
        # prev[l] = dp[l-1] (NEG_INF at l=0) via the subdiagonal matmul
        mask0 = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, dp0.shape, 1) == 0,
            NEG_INF, 0.0)
        # HIGHEST keeps the f32 lattice values un-rounded through the MXU
        # (the shift matrix is one-hot, so the dot is then exact), same
        # argument as the emission einsum in ops/decode
        prev0 = jnp.dot(dp0, shift_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) + mask0
        prev1 = jnp.dot(dp1, shift_ref[:],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) + mask0

        hold0 = dp0 + lpb0 + e0
        hold1 = dp1 + lpb0 + e1
        sw0 = lpb1 + lpi0 + e0   # switch into beta=0 (lpi pre-weighted)
        sw1 = lpb1 + lpi1 + e1   # switch into beta=1
        fc0 = prev0 + sw0   # from-correct
        fc1 = prev0 + sw1
        fi0 = prev1 + sw0   # from-incorrect
        fi1 = prev1 + sw1

        # first-max tie-breaking in candidate order (hold, from_c, from_i)
        def best(hold, fc, fi):
            new = jnp.maximum(hold, jnp.maximum(fc, fi))
            path = jnp.where((hold >= fc) & (hold >= fi), 0,
                             jnp.where(fc >= fi, 1, 2)).astype(jnp.int32)
            return new, path

        new0, p0 = best(hold0, fc0, fi0)
        new1, p1 = best(hold1, fc1, fi1)

        valid = t < tlen_ref[:]  # (BB, 1)
        dp0_scr[:] = jnp.where(valid, new0, dp0)
        dp1_scr[:] = jnp.where(valid, new1, dp1)
        path0_ref[0] = jnp.where(valid, p0, 0)
        path1_ref[0] = jnp.where(valid, p1, 0)

    # final lattice state persists in the constant-indexed output blocks
    dpf0_ref[:] = dp0_scr[:]
    dpf1_ref[:] = dp1_scr[:]


def _bwd_kernel(path0_ref, path1_ref, lastl_ref, beta0_ref,
                bflag_ref, mdemit_ref, plvl_ref,
                l_scr, beta_scr, md_scr, *, L: int):
    r = pl.program_id(1)   # r = 0 .. T-2, walking t = T-1 .. 1

    @pl.when(r == 0)
    def _():
        l_scr[:] = lastl_ref[:].astype(jnp.float32)
        beta_scr[:] = beta0_ref[:].astype(jnp.float32)
        md_scr[:] = beta0_ref[:].astype(jnp.float32)
        # plvl starts as zeros with beta0 at the last phoneme slot
        # Mosaic rejects float-dtype iota ops; build int lanes and convert.
        lanes = jax.lax.broadcasted_iota(
            jnp.int32, plvl_ref.shape, 1).astype(jnp.float32)
        plvl_ref[:] = jnp.where(lanes == lastl_ref[:].astype(jnp.float32),
                                beta0_ref[:].astype(jnp.float32), 0.0)

    l_cur = l_scr[:]        # (BB, 1) f32-encoded small ints
    beta = beta_scr[:]
    cur_md = md_scr[:]

    lanes = jax.lax.broadcasted_iota(
        jnp.int32, (l_cur.shape[0], L), 1).astype(jnp.float32)
    onehot_l = (lanes == l_cur).astype(jnp.float32)           # (BB, L)
    path_beta = jnp.where(beta == 0.0, path0_ref[0].astype(jnp.float32),
                          path1_ref[0].astype(jnp.float32))   # (BB, L)
    p = jnp.sum(path_beta * onehot_l, axis=1, keepdims=True)  # (BB, 1)

    is_b = (p > 0.0).astype(jnp.float32)
    new_md = jnp.where(p == 1.0, 0.0, jnp.where(p == 2.0, 1.0, cur_md))
    l_new = l_cur - is_b
    beta_new = jnp.where(is_b == 1.0, new_md, beta)
    plvl_ref[:] = jnp.where((is_b == 1.0) & (lanes == l_new),
                            new_md, plvl_ref[:])

    bflag_ref[0] = is_b
    mdemit_ref[0] = new_md
    l_scr[:] = l_new
    beta_scr[:] = beta_new
    md_scr[:] = new_md


def _bb(B: int) -> int:
    if B <= 128:
        return B
    return next((b for b in range(128, 0, -1) if B % b == 0 and b % 8 == 0),
                B)


def md_viterbi_batch_pallas(
    log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens,
    weight=1.0, interpret: bool = False,
):
    """Drop-in Pallas twin of ``decode.md_viterbi_batch`` (same argument
    and return contract; see there for the convention notes)."""
    B, T, N, _ = log_p_yx.shape
    L = y.shape[1]
    y = y.astype(jnp.int32)
    log_p_yx = jnp.asarray(log_p_yx, jnp.float32)
    log_p_y = jnp.asarray(log_p_y, jnp.float32)
    log_p_b = jnp.asarray(log_p_b, jnp.float32)
    log_p_pi = jnp.asarray(log_p_pi, jnp.float32)

    # emission selection stays in XLA (one-hot MXU contraction, see decode)
    onehot_y = jax.nn.one_hot(y, N, dtype=log_p_yx.dtype)
    sel = jnp.einsum("btnk,bln->btlk", log_p_yx, onehot_y,
                     precision=jax.lax.Precision.HIGHEST)
    prior_sel = log_p_y[y]
    e = sel - prior_sel[:, None, :, :]            # (B, T, L, 2)
    e_t = jnp.moveaxis(e, 1, 0)                   # (T, B, L, 2)
    e0, e1 = e_t[..., 0], e_t[..., 1]             # (T, B, L)
    lpb_t = jnp.moveaxis(log_p_b, 1, 0)           # (T, B, 2)
    # weight scales every lpi use in the recurrence and may be a tracer
    # (md_viterbi_batch is jitted): fold it in here, outside the kernel
    lpi_t = jnp.moveaxis(log_p_pi, 1, 0) * jnp.asarray(weight, jnp.float32)
    lpb0, lpb1 = lpb_t[..., 0:1], lpb_t[..., 1:2]  # (T, B, 1)
    lpi0, lpi1 = lpi_t[..., 0:1], lpi_t[..., 1:2]
    tlen_col = t_lens.astype(jnp.float32).reshape(B, 1)

    shift = jnp.eye(L, k=1, dtype=jnp.float32)    # dp @ shift -> dp[l-1]

    BB = _bb(B)
    tm = lambda b, t: (t, b, 0)       # time-stepped blocks, (T, BB, lanes)
    const2 = lambda b, t: (b, 0)      # per-batch-block constant blocks

    path0, path1, dpf0, dpf1 = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, L), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, L), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, L), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, L), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, L), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, L), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, L), jnp.int32),
            jax.ShapeDtypeStruct((T, B, L), jnp.int32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, L), jnp.float32),
            pltpu.VMEM((BB, L), jnp.float32),
        ],
        interpret=interpret,
    )(e0, e1, lpb0, lpb1, lpi0, lpi1, tlen_col,
      jnp.asarray(shift))

    # lattice end state -> starting beta (XLA: trivial)
    b_idx = jnp.arange(B)
    last_l = (l_lens - 1).astype(jnp.int32)
    dp_last0 = dpf0[b_idx, last_l]
    dp_last1 = dpf1[b_idx, last_l]
    beta0 = jnp.where(dp_last0 > dp_last1, 0, 1).astype(jnp.int32)

    if T == 1:
        boundary = jnp.ones((B, 1), jnp.int32)
        flvl = beta0[:, None]
        plvl = jnp.zeros((B, L), jnp.int32).at[b_idx, last_l].set(beta0)
        return boundary, flvl, plvl

    # backtrace over t = T-1 .. 1 (grid r = t reversed); paths[0] is the
    # t=0 slot the forward kernel zero-filled — skip it via the index maps
    tm_rev = lambda b, r: (T - 1 - r, b, 0)
    bflags, mdemits, plvl_f = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L),
        grid=(B // BB, T - 1),
        in_specs=[
            pl.BlockSpec((1, BB, L), tm_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, L), tm_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, 1), tm_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, 1), tm_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, L), const2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((T, B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, 1), jnp.float32),
            pltpu.VMEM((BB, 1), jnp.float32),
            pltpu.VMEM((BB, 1), jnp.float32),
        ],
        interpret=interpret,
    )(path0, path1, last_l.astype(jnp.float32).reshape(B, 1),
      beta0.astype(jnp.float32).reshape(B, 1))

    # assemble outputs exactly like md_viterbi_batch
    b_emit = bflags[1:, :, 0].astype(jnp.int32)     # t = 1 .. T-1
    md_emit = mdemits[1:, :, 0].astype(jnp.int32)
    boundary = jnp.zeros((B, T), jnp.int32)
    boundary = boundary.at[:, 1:].set(jnp.moveaxis(b_emit, 0, 1))
    boundary = boundary.at[:, 0].set(1)

    flvl = jnp.zeros((B, T), jnp.int32)
    flvl = flvl.at[:, :-1].set(jnp.moveaxis(md_emit, 0, 1))
    last_t = (t_lens - 1).astype(jnp.int32)
    flvl = flvl.at[b_idx, last_t].set(beta0)

    return boundary, flvl, plvl_f.astype(jnp.int32)
