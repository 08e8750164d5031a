"""EXPERIMENTAL: time-unrolled LSTM forward kernels (K steps per grid
iteration).

Hypothesis (docs/PERF.md "latency-bound" finding): the recurrence kernels
spend ~half of each sequential grid iteration on fixed per-iteration cost
(Mosaic loop/DMA bookkeeping), not compute — the measured ~9 us/iteration
vs ~2-4 us of MXU+VPU work.  Processing K consecutive time steps inside
one grid iteration amortizes that cost K-fold and (in the fused variant)
batches the K input projections into one bigger MXU dot.

Forward-only prototype: the backward kernels are scoped-VMEM-saturated at
the production shapes (streams x/cs/hs/dhs + resident W^T + f32 dW
accumulators ~15-16 MB at In=512, BB=128), so unrolling them forces a
smaller batch block and wins nothing.  If the forward A/B
(tools/bench_lstm_unroll.py) shows a real win, the production kernels in
``lstm_pallas.py`` grow a K parameter; otherwise this records the
rejected experiment.

Semantics: bit-identical to ``lstm_pallas._run_fwd`` / ``_run_fwd_fused``
(same gate math, same dtypes, same carry precision) — locked by
``tests/test_lstm_unroll_exp.py`` in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlvae_tpu.ops.lstm_pallas import (_b_block, _gate_acts, _sublane,
                                       _time_map)


def _fwd_kernel_k(gx_ref, whh_t_ref, hs_ref, cs_ref, h_scr, c_scr,
                  *, H: int, K: int, flip: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    for k in range(K):
        idx = K - 1 - k if flip else k
        gates = gx_ref[idx].astype(jnp.float32) + jnp.dot(
            h.astype(whh_t_ref.dtype), whh_t_ref[:],
            preferred_element_type=jnp.float32)
        i, f, g, o = _gate_acts(gates, H)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hs_ref[idx] = h.astype(hs_ref.dtype)
        cs_ref[idx] = c
    h_scr[:] = h
    c_scr[:] = c


def run_fwd_k(gates_x, w_hh, reverse: bool = False, K: int = 2,
              interpret: bool = False):
    """K-unrolled twin of ``lstm_pallas._run_fwd`` (gx streamed)."""
    T, B, G = gates_x.shape
    H = G // 4
    assert T % K == 0, (T, K)
    BB = _b_block(B, align=_sublane(gates_x.dtype))
    tm = _time_map(T // K, reverse)  # block units of K steps
    return pl.pallas_call(
        functools.partial(_fwd_kernel_k, H=H, K=K, flip=reverse),
        grid=(B // BB, T // K),
        in_specs=[
            pl.BlockSpec((K, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BB, H), tm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), gates_x.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(gates_x, w_hh.T)


def _fwd_fused_kernel_k(x_ref, wih_t_ref, bias_ref, whh_t_ref, hs_ref,
                        cs_ref, h_scr, c_scr, *, H: int, K: int, flip: bool):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    # all K input projections in ONE MXU dot: (K*BB, In) @ (In, 4H)
    xs = x_ref[:]
    Kb, BB, In = xs.shape
    gx = jnp.dot(xs.reshape(Kb * BB, In), wih_t_ref[:],
                 preferred_element_type=jnp.float32) + bias_ref[:]
    gx = gx.reshape(Kb, BB, 4 * H)

    h = h_scr[:]
    c = c_scr[:]
    for k in range(K):
        idx = K - 1 - k if flip else k
        gates = gx[idx] + jnp.dot(
            h.astype(whh_t_ref.dtype), whh_t_ref[:],
            preferred_element_type=jnp.float32)
        i, f, g, o = _gate_acts(gates, H)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        hs_ref[idx] = h.astype(hs_ref.dtype)
        cs_ref[idx] = c
    h_scr[:] = h
    c_scr[:] = c


def run_fwd_fused_k(x, w_ih, bias, w_hh, reverse: bool = False, K: int = 2,
                    interpret: bool = False):
    """K-unrolled twin of ``lstm_pallas._run_fwd_fused``."""
    T, B, In = x.shape
    H = w_hh.shape[1]
    assert T % K == 0, (T, K)
    BB = _b_block(B, align=_sublane(x.dtype))
    tm = _time_map(T // K, reverse)
    return pl.pallas_call(
        functools.partial(_fwd_fused_kernel_k, H=H, K=K, flip=reverse),
        grid=(B // BB, T // K),
        in_specs=[
            pl.BlockSpec((K, BB, In), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BB, H), tm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), x.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_ih.T, bias.astype(jnp.float32).reshape(1, -1), w_hh.T)
