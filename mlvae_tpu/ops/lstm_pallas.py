"""Pallas TPU LSTM recurrence kernel (forward + custom-VJP backward).

``lax.scan`` LSTMs pay a per-step XLA while-loop overhead that dominates at
speech-model sizes (measured ~5 us/step vs ~0.2 us of matmul work on v5e).
This kernel runs the WHOLE time loop inside one Mosaic program:

* the input projection (the big (B*T, 4H) matmul) stays in XLA where the
  MXU already runs it efficiently;
* the kernel keeps h/c carries and the (H, 4H) recurrent weights resident
  in VMEM across a sequential grid over T — no per-step dispatch, no
  HBM round trip for the carry;
* the backward kernel replays the recurrence in reverse (standard BPTT),
  RECOMPUTING the pre-activations from the saved h trajectory (one extra
  MXU dot per step — free, the step is HBM-bandwidth-bound) instead of
  materializing a (T, B, 4H) gates residual, accumulating dW_hh in VMEM
  and emitting per-step gate grads from which XLA recovers dX / dW_ih /
  db with one more big matmul;
* the REVERSE direction of a bi-LSTM is expressed purely through the grid
  index maps (gather block T-1-t, scatter to the same position), so no
  (T, B, 4H)/(T, B, H) ``jnp.flip`` is ever materialized in HBM — inputs
  and outputs stay in natural time order for both directions.

Exposed as ``lstm_layer(gates_x, w_hh, reverse)`` with a custom VJP; the
nn.LSTM module uses it on TPU and falls back to ``lax.scan`` elsewhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _gate_acts(gates, H: int):
    """(i, f, g, o) activations from the (BB, 4H) f32 pre-activations —
    the one definition of the gate order/nonlinearity every kernel uses."""
    return (_sigmoid(gates[:, 0 * H:1 * H]),
            _sigmoid(gates[:, 1 * H:2 * H]),
            jnp.tanh(gates[:, 2 * H:3 * H]),
            _sigmoid(gates[:, 3 * H:4 * H]))


def _bptt_dgates(gates, c_t, c_prev, dh, dc_in, H: int):
    """Shared BPTT step math for all backward kernels: pre-activation
    cotangents (f32) and the cell cotangent to carry to the previous step,
    from the recomputed gates and the saved cell trajectory."""
    i, f, g, o = _gate_acts(gates, H)
    tanh_c = jnp.tanh(c_t)
    do = dh * tanh_c
    dc = dc_in + dh * o * (1.0 - tanh_c * tanh_c)
    dgates = jnp.concatenate([
        dc * g * i * (1.0 - i),
        dc * c_prev * f * (1.0 - f),
        dc * i * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=1)  # (BB, 4H) f32
    return dgates, dc * f


def _recompute_fused_gates(x_t, h_prev, wih_t_ref, bias_ref, whh_t_ref):
    """Fused-path pre-activation recompute: both projections as MXU dots
    against the VMEM-resident transposed weights (f32 accumulation)."""
    return (jnp.dot(x_t, wih_t_ref[:], preferred_element_type=jnp.float32)
            + bias_ref[:]
            + jnp.dot(h_prev.astype(whh_t_ref.dtype), whh_t_ref[:],
                      preferred_element_type=jnp.float32))


def _bwd_recurrent_grads(dgates_w, h_prev, whh_t_ref, dh_scr, dwhh_ref):
    """Shared backward tail: dh for the previous step (into the scratch
    carry) and the f32 dW_hh accumulation in its constant-indexed output
    block; MXU dots in the weight dtype with f32 accumulation."""
    dh_scr[:] = jax.lax.dot_general(
        dgates_w, whh_t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwhh_ref[:] = dwhh_ref[:] + jnp.dot(
        h_prev.astype(whh_t_ref.dtype).T, dgates_w,
        preferred_element_type=jnp.float32)


def _fwd_kernel(gx_ref, whh_t_ref, hs_ref, cs_ref,
                h_scr, c_scr, *, H: int):
    t = pl.program_id(1)  # time is the INNER grid dim; batch blocks outer

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    # gx may stream as bf16 (AMP): upcast in-register; carries/compute
    # stay f32 in VMEM (bf16 carries drift over long sequences).  Under
    # AMP the recurrent weights arrive bf16 and the dot runs as one bf16
    # MXU pass with f32 accumulation (cuDNN-AMP-equivalent); in f32 mode
    # both operands are f32 and the dot is exact.
    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(whh_t_ref.dtype), whh_t_ref[:],
        preferred_element_type=jnp.float32)
    i, f, g, o = _gate_acts(gates, H)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    cs_ref[0] = c_new
    h_scr[:] = h_new
    c_scr[:] = c_new


def _bwd_kernel(gx_ref, cs_prev_ref, cs_ref, hs_prev_ref, dhs_ref,
                dc_last_ref, whh_t_ref, dgx_ref, dwhh_ref, dh_scr, dc_scr,
                *, H: int):
    b = pl.program_id(0)
    r = pl.program_id(1)  # 0 .. T-1, walking processing order BACKWARD

    @pl.when(r == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = dc_last_ref[:]  # cotangent of the returned final c

    @pl.when((r == 0) & (b == 0))
    def _():
        # dW_hh accumulates directly in the (constant-indexed, VMEM-resident)
        # output block across ALL batch blocks — zero once at the start
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    # cs_prev/hs_prev are VIEWS of the saved trajectories through a
    # shifted index map (no concatenated copies in HBM); at the first
    # processed step (r == T-1 here) the shifted map is clamped and the
    # true previous state is the initial zeros — mask it in-kernel.
    valid = (r != pl.num_programs(1) - 1).astype(jnp.float32)

    # Recompute the pre-activations instead of reading a saved residual:
    # the extra (BB,H)x(H,4H) dot is free on the idle MXU, while NOT
    # writing the (T,B,4H) f32 gates tensor in the forward pass removes
    # the single largest HBM stream of the training step.
    # keep h_prev in the streamed dtype for the MXU dots (bf16 under AMP)
    h_prev = hs_prev_ref[0] * valid.astype(hs_prev_ref.dtype)
    gates = gx_ref[0].astype(jnp.float32) + jnp.dot(
        h_prev.astype(whh_t_ref.dtype), whh_t_ref[:],
        preferred_element_type=jnp.float32)
    c_prev = cs_prev_ref[0] * valid   # zeros at the first processed step

    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    dgates, dc_next = _bptt_dgates(gates, cs_ref[0], c_prev, dh,
                                   dc_scr[:], H)
    dc_scr[:] = dc_next
    # dgates streams out in the gx dtype (bf16 under AMP); MXU dots in the
    # weight dtype with f32 accumulation — no transposed weight copy
    dgx_ref[0] = dgates.astype(dgx_ref.dtype)
    _bwd_recurrent_grads(dgates.astype(whh_t_ref.dtype), h_prev,
                         whh_t_ref, dh_scr, dwhh_ref)


MAX_B_BLOCK = 64  # VMEM budget per batch block (v5e: 128 fits only when the
                  # grid has a single batch block; block transitions add a
                  # pipeline buffer that tips 16 MB)


def _sublane(dtype) -> int:
    """Sublane tile rows for the dtype (f32: 8, bf16: 16)."""
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _b_block(B: int, cap: int = 128, align: int = 8) -> int:
    """Largest batch block <= cap that divides B AND is a multiple of the
    dtype's sublane tile (single block when B <= cap: no transition buffer,
    fastest).  Must always return an exact divisor — the grid is
    (B // BB, T), so a non-divisor would silently leave trailing batch rows
    uncomputed.  A non-tile-multiple block would start blocks at misaligned
    batch offsets (e.g. B=144 bf16 -> 72), which Mosaic either rejects or
    pads — on the REAL dispatch path an aligned divisor always exists
    because ``_pallas_eligible`` guarantees B % align == 0 (``align``
    itself then qualifies); for arbitrary B (interpret-mode tests) fall
    back to the largest plain divisor, which is still exact."""
    if B <= cap:
        return B
    blk = next((b for b in range(cap, 0, -1)
                if B % b == 0 and b % align == 0), None)
    if blk is None:
        blk = next(b for b in range(cap, 0, -1) if B % b == 0)
    return blk


def _b_block_bwd(B: int, dtype) -> int:
    """Batch block for the BACKWARD kernel, which streams ~6 time-varying
    blocks (gx, dgx, four h/c trajectory views) double-buffered plus the
    resident W_hh^T and dW_hh accumulator.  In f32 a single B=128 block sits
    exactly at the 16 MB scoped-VMEM edge — any unrelated HLO layout change
    tips it into a compile-time OOM — so f32 caps at MAX_B_BLOCK; bf16
    streams keep the fast single-block grid up to B=128."""
    cap = MAX_B_BLOCK if jnp.dtype(dtype).itemsize >= 4 else 128
    return _b_block(B, cap, _sublane(dtype))


def _time_map(T: int, flipped: bool):
    """Block index map over (T, B, *) arrays: gather/scatter position t (or
    T-1-t when the PROCESSING order is reversed), batch-block b."""
    if flipped:
        return lambda b, t: (T - 1 - t, b, 0)
    return lambda b, t: (t, b, 0)


def _run_fwd(gates_x, w_hh, reverse: bool, interpret: bool):
    """gates_x: (T, B, 4H) natural time order; w_hh: (4H, H) torch layout.

    Grid = (batch blocks, T): time is the sequential inner dimension so the
    h/c scratch carries persist within each batch block; batch blocking keeps
    VMEM bounded for any B.  ``reverse`` processes t = T-1..0 via the index
    maps; outputs are scattered back to natural positions (no flips)."""
    T, B, G = gates_x.shape
    H = G // 4
    BB = _b_block(B, align=_sublane(gates_x.dtype))
    whh_t = w_hh.T  # (H, 4H)
    tm = _time_map(T, reverse)
    hs, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # hs streams in the input dtype (bf16 under AMP: the consumers
            # are bf16 matmuls); cs stays f32 (backward dc-chain precision)
            jax.ShapeDtypeStruct((T, B, H), gates_x.dtype),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(gates_x, whh_t)
    return hs, cs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def lstm_layer(gates_x, w_hh, reverse: bool = False,
               interpret: bool = False):
    """Pallas LSTM recurrence: (T, B, 4H) pre-gates + (4H, H) W_hh ->
    ((T, B, H) hidden states in natural time order, (B, H) final cell
    state — the state after the last PROCESSED step, i.e. t=0 when
    ``reverse``)."""
    hs, cs = _run_fwd(gates_x, w_hh, reverse, interpret)
    return hs, (cs[0] if reverse else cs[-1])


def _vjp_fwd(gates_x, w_hh, reverse, interpret):
    hs, cs = _run_fwd(gates_x, w_hh, reverse, interpret)
    # residuals: the INPUT pre-gates (already in HBM, no copy) + h/c
    # trajectories; pre-activations are recomputed in the backward kernel
    c_last = cs[0] if reverse else cs[-1]
    return (hs, c_last), (w_hh, gates_x, hs, cs)


def _run_bwd(gates_x, hs, cs, dhs, dc_last, w_hh, reverse: bool,
             interpret: bool):
    """Backward kernel launch: returns (dgx (T,B,4H), dW_hh (4H,H) torch
    layout).  Shared by the single-device VJP and the shard_map DP path."""
    T, B, H = hs.shape
    G = 4 * H

    BB = _b_block_bwd(B, gates_x.dtype)
    # BPTT walks the processing order backward: r=0 is the LAST processed
    # step (t=T-1 forward, t=0 reverse)
    tm = _time_map(T, not reverse)
    # previous-in-PROCESSING-order state views: the SAME hs/cs arrays read
    # through a one-step-shifted index map (clamped at the first processed
    # step, where the kernel masks the block to zeros) — no concatenated
    # (T, B, H) copies in HBM.
    if reverse:  # processing order was t = T-1..0, so "previous" is t+1
        tm_prev = lambda b, r: (jnp.minimum(r + 1, T - 1), b, 0)
    else:        # processing order was t = 0..T-1; BPTT visits t = T-1-r
        tm_prev = lambda b, r: (jnp.maximum(T - 2 - r, 0), b, 0)
    dgx, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),  # gx
            pl.BlockSpec((1, BB, H), tm_prev,
                         memory_space=pltpu.VMEM),                    # c_prev
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec((1, BB, H), tm_prev,
                         memory_space=pltpu.VMEM),                    # h_prev
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),  # dhs
            pl.BlockSpec((BB, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),                   # dc_last
            pl.BlockSpec((H, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),                   # w_hh^T
        ],
        out_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dgx in the gx dtype: its consumers (dX / dW_ih / db matmuls)
            # run bf16 on the MXU under AMP; dW_hh accumulates f32
            jax.ShapeDtypeStruct((T, B, G), gates_x.dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(gates_x, cs, cs, hs, dhs, dc_last, w_hh.T)
    # dW_hh accumulates f32 in VMEM; emit in the weight dtype (the AMP
    # cast transpose upcasts the cotangent to the f32 master params)
    return dgx, dwhh.T.astype(w_hh.dtype)


def _vjp_bwd(reverse, interpret, residuals, cotangents):
    dhs, dc_last = cotangents
    w_hh, gates_x, hs, cs = residuals
    return _run_bwd(gates_x, hs, cs, dhs, dc_last, w_hh, reverse, interpret)


lstm_layer.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Fused input-projection variant: the (T,B,4H) gates tensor never exists
# --------------------------------------------------------------------------
#
# The unfused path touches the gates tensor five times per layer (XLA
# projection write, forward read, backward read, dgx write, dgx read by the
# dX/dW_ih/db matmuls) — ~43% of the whole training step's HBM traffic
# (docs/PERF.md roofline).  Here the input projection joins the recurrence
# inside the kernel: W_ih^T sits in VMEM next to W_hh^T, the forward streams
# x (T,B,In) instead of gx (T,B,4H), and the backward streams x in and dX
# out while accumulating dW_ih and db in VMEM alongside dW_hh.  For In = H
# that replaces ~5 x (T,B,4H) of traffic with ~3 x (T,B,In).


def _fwd_fused_kernel(x_ref, wih_t_ref, bias_ref, whh_t_ref, hs_ref, cs_ref,
                      h_scr, c_scr, *, H: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    h = h_scr[:]
    c = c_scr[:]
    # both projections as bf16/f32 MXU passes with f32 accumulation; the
    # bias was already folded to f32
    gates = _recompute_fused_gates(x_ref[0], h, wih_t_ref, bias_ref,
                                   whh_t_ref)
    i, f, g, o = _gate_acts(gates, H)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    cs_ref[0] = c_new
    h_scr[:] = h_new
    c_scr[:] = c_new


def _bwd_fused_kernel(x_ref, cs_prev_ref, cs_ref, hs_prev_ref, dhs_ref,
                      dc_last_ref, wih_t_ref, bias_ref, whh_t_ref,
                      dx_ref, dwih_ref, db_ref, dwhh_ref, dh_scr, dc_scr,
                      *, H: int):
    b = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = dc_last_ref[:]

    @pl.when((r == 0) & (b == 0))
    def _():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    valid = (r != pl.num_programs(1) - 1).astype(jnp.float32)

    # recompute the pre-activations from the streamed x block and the
    # shifted h trajectory view — two MXU dots on the idle MXU instead of
    # reading a (T,B,4H) residual from HBM
    h_prev = hs_prev_ref[0] * valid.astype(hs_prev_ref.dtype)
    x_t = x_ref[0]
    gates = _recompute_fused_gates(x_t, h_prev, wih_t_ref, bias_ref,
                                   whh_t_ref)
    c_prev = cs_prev_ref[0] * valid

    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    dgates, dc_next = _bptt_dgates(gates, cs_ref[0], c_prev, dh,
                                   dc_scr[:], H)
    dc_scr[:] = dc_next
    dgates_w = dgates.astype(whh_t_ref.dtype)
    # dX streams out in the x dtype; dW_ih / db / dW_hh accumulate f32 in
    # constant-indexed VMEM blocks across the whole grid
    dx_ref[0] = jax.lax.dot_general(
        dgates_w, wih_t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dwih_ref[:] = dwih_ref[:] + jnp.dot(
        x_t.T, dgates_w, preferred_element_type=jnp.float32)
    db_ref[:] = db_ref[:] + jnp.sum(dgates, axis=0, keepdims=True)
    _bwd_recurrent_grads(dgates_w, h_prev, whh_t_ref, dh_scr, dwhh_ref)


# scoped-VMEM budget for the fused BACKWARD residents (W_ih^T + W_hh^T in
# the stream dtype, dW_ih + dW_hh f32 accumulators); streams double-buffer
# in what remains of the ~16 MB window
FUSED_RESIDENT_BUDGET = 13 * 1024 * 1024


def fused_eligible(In: int, H: int, dtype) -> bool:
    """Static dispatch predicate for the fused path: lane-aligned input
    feature dim (the x/dX blocks put In on the 128-wide lane axis) and the
    backward kernel's resident weights + accumulators within budget."""
    if In % 128 != 0 or H % 128 != 0:
        return False
    wbytes = jnp.dtype(dtype).itemsize
    resident = (In + H) * 4 * H * wbytes + (In + H) * 4 * H * 4
    return resident <= FUSED_RESIDENT_BUDGET


def _run_fwd_fused(x, w_ih, bias, w_hh, reverse: bool, interpret: bool):
    """x: (T, B, In); w_ih: (4H, In) / w_hh: (4H, H) torch layout;
    bias: (4H,) f32 (b_ih + b_hh folded)."""
    T, B, In = x.shape
    H = w_hh.shape[1]
    BB = _b_block(B, align=_sublane(x.dtype))
    tm = _time_map(T, reverse)
    hs, cs = pl.pallas_call(
        functools.partial(_fwd_fused_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, In), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
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
    return hs, cs


def _run_bwd_fused(x, w_ih, bias, w_hh, hs, cs, dhs, dc_last,
                   reverse: bool, interpret: bool):
    T, B, In = x.shape
    H = w_hh.shape[1]
    G = 4 * H
    BB = _b_block_bwd(B, x.dtype)
    tm = _time_map(T, not reverse)
    if reverse:
        tm_prev = lambda b, r: (jnp.minimum(r + 1, T - 1), b, 0)
    else:
        tm_prev = lambda b, r: (jnp.maximum(T - 2 - r, 0), b, 0)
    const = lambda b, r: (0, 0)
    dx, dwih, db, dwhh = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, In), tm, memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),    # c_t
            pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),    # dhs
            pl.BlockSpec((BB, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),                    # dc_last
            pl.BlockSpec((In, G), const, memory_space=pltpu.VMEM),    # w_ih^T
            pl.BlockSpec((1, G), const, memory_space=pltpu.VMEM),     # bias
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),     # w_hh^T
        ],
        out_specs=[
            pl.BlockSpec((1, BB, In), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((In, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, In), x.dtype),
            jax.ShapeDtypeStruct((In, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x, cs, cs, hs, dhs, dc_last,
      w_ih.T, bias.astype(jnp.float32).reshape(1, -1), w_hh.T)
    return (dx, dwih.T.astype(w_ih.dtype), db[0].astype(bias.dtype),
            dwhh.T.astype(w_hh.dtype))


def _bwd_semi_kernel(x_ref, cs_prev_ref, cs_ref, hs_prev_ref, dhs_ref,
                     dc_last_ref, wih_t_ref, bias_ref, whh_t_ref,
                     dgx_ref, dwhh_ref, dh_scr, dc_scr, *, H: int):
    """Half-fused backward: gates recomputed from the streamed x block (no
    gx residual in HBM), but dgates streams OUT for XLA's dX/dW_ih/db
    matmuls — used when the full-fused dW_ih accumulator would blow the
    scoped-VMEM budget (the In=2H bi-decoder layers)."""
    b = pl.program_id(0)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = dc_last_ref[:]

    @pl.when((r == 0) & (b == 0))
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    valid = (r != pl.num_programs(1) - 1).astype(jnp.float32)
    h_prev = hs_prev_ref[0] * valid.astype(hs_prev_ref.dtype)
    gates = _recompute_fused_gates(x_ref[0], h_prev, wih_t_ref, bias_ref,
                                   whh_t_ref)
    c_prev = cs_prev_ref[0] * valid

    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    dgates, dc_next = _bptt_dgates(gates, cs_ref[0], c_prev, dh,
                                   dc_scr[:], H)
    dc_scr[:] = dc_next
    dgx_ref[0] = dgates.astype(dgx_ref.dtype)
    _bwd_recurrent_grads(dgates.astype(whh_t_ref.dtype), h_prev,
                         whh_t_ref, dh_scr, dwhh_ref)


def semifused_eligible(In: int, H: int, dtype) -> bool:
    """Half-fused dispatch predicate: lane-aligned In, and the backward
    residents WITHOUT the dW_ih accumulator within budget."""
    if In % 128 != 0 or H % 128 != 0:
        return False
    wbytes = jnp.dtype(dtype).itemsize
    resident = (In + H) * 4 * H * wbytes + H * 4 * H * 4
    return resident <= FUSED_RESIDENT_BUDGET


def _run_bwd_semi(x, w_ih, bias, w_hh, hs, cs, dhs, dc_last,
                  reverse: bool, interpret: bool):
    T, B, In = x.shape
    H = w_hh.shape[1]
    G = 4 * H
    BB = _b_block_bwd(B, x.dtype)
    tm = _time_map(T, not reverse)
    if reverse:
        tm_prev = lambda b, r: (jnp.minimum(r + 1, T - 1), b, 0)
    else:
        tm_prev = lambda b, r: (jnp.maximum(T - 2 - r, 0), b, 0)
    const = lambda b, r: (0, 0)
    dgx, dwhh = pl.pallas_call(
        functools.partial(_bwd_semi_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, In), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H), lambda b, r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((In, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G), x.dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BB, H), jnp.float32),
            pltpu.VMEM((BB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x, cs, cs, hs, dhs, dc_last,
      w_ih.T, bias.astype(jnp.float32).reshape(1, -1), w_hh.T)
    return dgx, dwhh.T.astype(w_hh.dtype)


def _semi_input_grads(x, w_ih, bias, dgx):
    """XLA side of the half-fused backward: dX / dW_ih / db from the
    streamed dgates (the same matmuls the unfused path runs)."""
    dx = jnp.einsum("tbg,gc->tbc", dgx, w_ih,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    dwih = jnp.einsum("tbg,tbc->gc", dgx, x,
                      preferred_element_type=jnp.float32).astype(w_ih.dtype)
    db = jnp.sum(dgx, axis=(0, 1), dtype=jnp.float32).astype(bias.dtype)
    return dx, dwih, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_layer_semifused(x, w_ih, bias, w_hh, reverse: bool = False,
                         interpret: bool = False):
    """Half-fused Pallas LSTM: fused forward (no gx in HBM) + a backward
    that streams x, recomputes the gates with the resident W_ih^T, and
    emits dgx for XLA's dX/dW_ih/db matmuls.  Same signature/semantics as
    :func:`lstm_layer_fused`; used where that kernel's f32 dW_ih
    accumulator would not fit in VMEM."""
    hs, cs = _run_fwd_fused(x, w_ih, bias, w_hh, reverse, interpret)
    return hs, (cs[0] if reverse else cs[-1])


def _vjp_fwd_semi(x, w_ih, bias, w_hh, reverse, interpret):
    hs, cs = _run_fwd_fused(x, w_ih, bias, w_hh, reverse, interpret)
    c_last = cs[0] if reverse else cs[-1]
    return (hs, c_last), (x, w_ih, bias, w_hh, hs, cs)


def _vjp_bwd_semi(reverse, interpret, residuals, cotangents):
    dhs, dc_last = cotangents
    x, w_ih, bias, w_hh, hs, cs = residuals
    dgx, dwhh = _run_bwd_semi(x, w_ih, bias, w_hh, hs, cs, dhs, dc_last,
                              reverse, interpret)
    dx, dwih, db = _semi_input_grads(x, w_ih, bias, dgx)
    return dx, dwih, db, dwhh


lstm_layer_semifused.defvjp(_vjp_fwd_semi, _vjp_bwd_semi)


def _make_sharded_fused_family(mesh, data_axis: str, semifused: bool):
    """Shared shard_map + custom-VJP scaffolding for the fused-projection
    kernel family under a device mesh.  The forward is identical for both
    tiers; they differ only in the backward leg:

    * fully fused — dX/dW_ih/db/dW_hh all come out of the per-shard kernel,
      weight grads psum'd over the data axis in-rule;
    * half-fused — the kernel emits the batch-sharded dgx (+ psum'd dW_hh)
      and the dX/dW_ih/db matmuls run outside shard_map, where GSPMD
      inserts the same psum it would for any batch-parallel weight grad.
    """
    from jax.sharding import PartitionSpec as P

    spec_tb = P(None, data_axis, None)
    spec_b = P(data_axis, None)
    rep = P()

    def _sm(fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _fwd(x, w_ih, bias, w_hh, reverse, interpret):
        return _sm(
            functools.partial(_run_fwd_fused, reverse=reverse,
                              interpret=interpret),
            (spec_tb, rep, rep, rep), (spec_tb, spec_tb),
        )(x, w_ih, bias, w_hh)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def f(x, w_ih, bias, w_hh, reverse: bool = False,
          interpret: bool = False):
        hs, cs = _fwd(x, w_ih, bias, w_hh, reverse, interpret)
        return hs, (cs[0] if reverse else cs[-1])

    def fwd_rule(x, w_ih, bias, w_hh, reverse, interpret):
        hs, cs = _fwd(x, w_ih, bias, w_hh, reverse, interpret)
        c_last = cs[0] if reverse else cs[-1]
        return (hs, c_last), (x, w_ih, bias, w_hh, hs, cs)

    bwd_in = (spec_tb, spec_tb, spec_tb, spec_tb, spec_b, rep, rep, rep)

    def bwd_rule_semi(reverse, interpret, residuals, cotangents):
        dhs, dc_last = cotangents
        x, w_ih, bias, w_hh, hs, cs = residuals

        def local(x_l, hs_l, cs_l, dhs_l, dcl, wi, b, wh):
            dgx, dwhh = _run_bwd_semi(x_l, wi, b, wh, hs_l, cs_l, dhs_l,
                                      dcl, reverse, interpret)
            return dgx, jax.lax.psum(dwhh, data_axis)

        dgx, dwhh = _sm(local, bwd_in, (spec_tb, rep))(
            x, hs, cs, dhs, dc_last, w_ih, bias, w_hh)
        dx, dwih, db = _semi_input_grads(x, w_ih, bias, dgx)
        return dx, dwih, db, dwhh

    def bwd_rule_full(reverse, interpret, residuals, cotangents):
        dhs, dc_last = cotangents
        x, w_ih, bias, w_hh, hs, cs = residuals

        def local(x_l, hs_l, cs_l, dhs_l, dcl, wi, b, wh):
            dx, dwih, db, dwhh = _run_bwd_fused(
                x_l, wi, b, wh, hs_l, cs_l, dhs_l, dcl, reverse, interpret)
            return (dx, jax.lax.psum(dwih, data_axis),
                    jax.lax.psum(db, data_axis),
                    jax.lax.psum(dwhh, data_axis))

        return _sm(local, bwd_in, (spec_tb, rep, rep, rep))(
            x, hs, cs, dhs, dc_last, w_ih, bias, w_hh)

    f.defvjp(fwd_rule, bwd_rule_semi if semifused else bwd_rule_full)
    return f


@functools.lru_cache(maxsize=None)
def sharded_lstm_layer_semifused(mesh, data_axis: str = "data"):
    """Half-fused kernel per batch shard (see
    :func:`_make_sharded_fused_family`)."""
    return _make_sharded_fused_family(mesh, data_axis, semifused=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_layer_fused(x, w_ih, bias, w_hh, reverse: bool = False,
                     interpret: bool = False):
    """Fused-projection Pallas LSTM: (T, B, In) inputs + torch-layout
    (4H, In) W_ih / (4H,) bias / (4H, H) W_hh -> ((T, B, H) hidden states
    in natural time order, (B, H) final cell state).  Semantics identical
    to ``lstm_layer(x @ W_ih^T + bias, w_hh, reverse)``."""
    hs, cs = _run_fwd_fused(x, w_ih, bias, w_hh, reverse, interpret)
    return hs, (cs[0] if reverse else cs[-1])


def _vjp_fwd_fused(x, w_ih, bias, w_hh, reverse, interpret):
    hs, cs = _run_fwd_fused(x, w_ih, bias, w_hh, reverse, interpret)
    c_last = cs[0] if reverse else cs[-1]
    return (hs, c_last), (x, w_ih, bias, w_hh, hs, cs)


def _vjp_bwd_fused(reverse, interpret, residuals, cotangents):
    dhs, dc_last = cotangents
    x, w_ih, bias, w_hh, hs, cs = residuals
    return _run_bwd_fused(x, w_ih, bias, w_hh, hs, cs, dhs, dc_last,
                          reverse, interpret)


lstm_layer_fused.defvjp(_vjp_fwd_fused, _vjp_bwd_fused)


@functools.lru_cache(maxsize=None)
def sharded_lstm_layer_fused(mesh, data_axis: str = "data"):
    """Fused-projection kernel per batch shard (see
    :func:`_make_sharded_fused_family`); dW_ih / db / dW_hh psum over the
    data axis like any batch-parallel matmul's weight gradients."""
    return _make_sharded_fused_family(mesh, data_axis, semifused=False)


@functools.lru_cache(maxsize=None)
def sharded_lstm_layer(mesh, data_axis: str = "data"):
    """``lstm_layer`` running per-device on the local batch shard.

    XLA's GSPMD partitioner cannot split a Pallas custom call, so under a
    device mesh the kernels are launched inside ``jax.shard_map`` over the
    batch-sharding axis: each chip runs the recurrence on its local (T,
    B/d, 4H) shard with the (replicated) recurrent weights resident in its
    own VMEM.  The only cross-chip communication the layer itself needs is
    one ``psum`` of the per-shard dW_hh accumulator in the backward pass —
    the same collective XLA would emit for any batch-parallel matmul's
    weight gradient, riding ICI.

    Returns a function ``f(gates_x, w_hh, reverse=False, interpret=False)``
    with the same signature/semantics as :func:`lstm_layer`.  Cached per
    (mesh, axis) so repeated traces reuse one custom-VJP instance.
    """
    from jax.sharding import PartitionSpec as P

    spec_tb = P(None, data_axis, None)  # (T, B, *): batch-sharded
    spec_b = P(data_axis, None)         # (B, H)
    rep = P()

    def _sm(fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _fwd(gates_x, w_hh, reverse, interpret):
        return _sm(
            functools.partial(_run_fwd, reverse=reverse, interpret=interpret),
            (spec_tb, rep), (spec_tb, spec_tb),
        )(gates_x, w_hh)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def f(gates_x, w_hh, reverse: bool = False, interpret: bool = False):
        hs, cs = _fwd(gates_x, w_hh, reverse, interpret)
        return hs, (cs[0] if reverse else cs[-1])

    def fwd_rule(gates_x, w_hh, reverse, interpret):
        hs, cs = _fwd(gates_x, w_hh, reverse, interpret)
        c_last = cs[0] if reverse else cs[-1]
        return (hs, c_last), (w_hh, gates_x, hs, cs)

    def bwd_rule(reverse, interpret, residuals, cotangents):
        dhs, dc_last = cotangents
        w_hh, gates_x, hs, cs = residuals

        def local(gx, hs_l, cs_l, dhs_l, dcl, w):
            dgx, dwhh = _run_bwd(gx, hs_l, cs_l, dhs_l, dcl, w,
                                 reverse, interpret)
            # per-shard accumulator -> global weight grad over ICI
            return dgx, jax.lax.psum(dwhh, data_axis)

        return _sm(
            local,
            (spec_tb, spec_tb, spec_tb, spec_tb, spec_b, rep),
            (spec_tb, rep),
        )(gates_x, hs, cs, dhs, dc_last, w_hh)

    f.defvjp(fwd_rule, bwd_rule)
    return f
