"""Pallas TPU GRU recurrence kernel (forward + custom-VJP backward).

Same design as the LSTM kernel (``ops/lstm_pallas.py``): the whole time
loop runs inside one Mosaic program with the h carry and the (H, 3H)
recurrent weights resident in VMEM; the input projection stays in XLA.
torch gate order (r, z, n) with the hidden-side candidate bias INSIDE the
reset product (``n = tanh(gx_n + r * (h @ W_hn^T + b_hn))``), so the
hidden bias is a kernel input (it cannot be folded into gx).

The backward kernel replays the recurrence in reverse, RECOMPUTING the
hidden-side projection from the saved h trajectory instead of storing a
(T, B, 3H) residual, and accumulates dW_hh / db_hh in VMEM.

Dtype-native like the LSTM kernel: gx/hs stream in the input dtype (bf16
under AMP — the dots then run as single bf16 MXU passes with f32
accumulation); the h carry and all gate arithmetic stay f32 in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mlvae_tpu.ops.lstm_pallas import _b_block, _b_block_bwd, _time_map


def _fwd_kernel(gx_ref, whh_t_ref, bhh_ref, hs_ref, h_scr, *, H: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]
    gh = jnp.dot(h.astype(whh_t_ref.dtype), whh_t_ref[:],
                 preferred_element_type=jnp.float32) \
        + bhh_ref[:].astype(jnp.float32)
    gx = gx_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(gx[:, 0 * H:1 * H] + gh[:, 0 * H:1 * H])
    z = jax.nn.sigmoid(gx[:, 1 * H:2 * H] + gh[:, 1 * H:2 * H])
    n = jnp.tanh(gx[:, 2 * H:3 * H] + r * gh[:, 2 * H:3 * H])
    h_new = (1.0 - z) * n + z * h
    hs_ref[0] = h_new.astype(hs_ref.dtype)
    h_scr[:] = h_new


def _bwd_kernel(gx_ref, hs_prev_ref, dhs_ref, whh_t_ref, bhh_ref,
                dgx_ref, dwhh_ref, dbhh_ref, dh_scr, *, H: int):
    b = pl.program_id(0)
    r_id = pl.program_id(1)  # walks the processing order backward

    @pl.when(r_id == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when((r_id == 0) & (b == 0))
    def _():
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    valid = (r_id != pl.num_programs(1) - 1).astype(jnp.float32)
    h_prev = hs_prev_ref[0] * valid.astype(hs_prev_ref.dtype)
    h_prev_f = h_prev.astype(jnp.float32)

    gh = jnp.dot(h_prev.astype(whh_t_ref.dtype), whh_t_ref[:],
                 preferred_element_type=jnp.float32) \
        + bhh_ref[:].astype(jnp.float32)
    gx = gx_ref[0].astype(jnp.float32)
    r = jax.nn.sigmoid(gx[:, 0 * H:1 * H] + gh[:, 0 * H:1 * H])
    z = jax.nn.sigmoid(gx[:, 1 * H:2 * H] + gh[:, 1 * H:2 * H])
    hn = gh[:, 2 * H:3 * H]
    n = jnp.tanh(gx[:, 2 * H:3 * H] + r * hn)

    dh = dhs_ref[0].astype(jnp.float32) + dh_scr[:]
    dz = dh * (h_prev_f - n)
    dn = dh * (1.0 - z)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)

    dgx = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)      # (B, 3H)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=1)  # (B, 3H)
    dgx_ref[0] = dgx.astype(dgx_ref.dtype)

    dgh_w = dgh.astype(whh_t_ref.dtype)
    dh_scr[:] = dh * z + jax.lax.dot_general(
        dgh_w, whh_t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwhh_ref[:] = dwhh_ref[:] + jnp.dot(
        h_prev.astype(whh_t_ref.dtype).T, dgh_w,
        preferred_element_type=jnp.float32)
    dbhh_ref[:] = dbhh_ref[:] + jnp.sum(dgh, axis=0, keepdims=True)


def _run_fwd(gates_x, w_hh, b_hh, reverse: bool, interpret: bool):
    """gates_x: (T, B, 3H) = x @ W_ih^T + b_ih, natural time order;
    w_hh: (3H, H) torch layout; b_hh: (3H,)."""
    T, B, G = gates_x.shape
    H = G // 3
    BB = _b_block(B)
    tm = _time_map(T, reverse)
    hs, = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), gates_x.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((BB, H), jnp.float32)],
        interpret=interpret,
    )(gates_x, w_hh.T, b_hh.reshape(1, G))
    return hs


def _run_bwd(gates_x, hs, dhs, w_hh, b_hh, reverse: bool, interpret: bool):
    T, B, H = hs.shape
    G = 3 * H
    BB = _b_block_bwd(B, gates_x.dtype)
    tm = _time_map(T, not reverse)
    if reverse:
        tm_prev = lambda b, r: (jnp.minimum(r + 1, T - 1), b, 0)
    else:
        tm_prev = lambda b, r: (jnp.maximum(T - 2 - r, 0), b, 0)
    dgx, dwhh, dbhh = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, G), gates_x.dtype),
            jax.ShapeDtypeStruct((H, G), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((BB, H), jnp.float32)],
        interpret=interpret,
    )(gates_x, hs, dhs, w_hh.T, b_hh.reshape(1, G))
    return dgx, dwhh, dbhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_layer(gates_x, w_hh, b_hh, reverse: bool = False,
              interpret: bool = False):
    """Pallas GRU recurrence: (T, B, 3H) input-side pre-gates + (3H, H)
    W_hh + (3H,) b_hh -> (T, B, H) hidden states in natural time order."""
    return _run_fwd(gates_x, w_hh, b_hh, reverse, interpret)


def _vjp_fwd(gates_x, w_hh, b_hh, reverse, interpret):
    hs = _run_fwd(gates_x, w_hh, b_hh, reverse, interpret)
    return hs, (w_hh, b_hh, gates_x, hs)


def _vjp_bwd(reverse, interpret, residuals, dhs):
    w_hh, b_hh, gates_x, hs = residuals
    dgx, dwhh, dbhh = _run_bwd(gates_x, hs, dhs, w_hh, b_hh,
                               reverse, interpret)
    return (dgx, dwhh.T.astype(w_hh.dtype),
            dbhh.reshape(-1).astype(b_hh.dtype))


gru_layer.defvjp(_vjp_fwd, _vjp_bwd)


@functools.lru_cache(maxsize=None)
def sharded_gru_layer(mesh, data_axis: str = "data"):
    """``gru_layer`` running per-device on the local batch shard via
    ``jax.shard_map`` (same rationale as ``lstm_pallas.sharded_lstm_layer``:
    GSPMD cannot partition the custom call).  dW_hh/db_hh are psum'd over
    the data axis in the backward pass."""
    from jax.sharding import PartitionSpec as P

    spec_tb = P(None, data_axis, None)
    rep = P()

    def _sm(fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _fwd(gates_x, w_hh, b_hh, reverse, interpret):
        return _sm(
            functools.partial(_run_fwd, reverse=reverse,
                              interpret=interpret),
            (spec_tb, rep, rep), spec_tb,
        )(gates_x, w_hh, b_hh)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def f(gates_x, w_hh, b_hh, reverse: bool = False,
          interpret: bool = False):
        return _fwd(gates_x, w_hh, b_hh, reverse, interpret)

    def fwd_rule(gates_x, w_hh, b_hh, reverse, interpret):
        hs = _fwd(gates_x, w_hh, b_hh, reverse, interpret)
        return hs, (w_hh, b_hh, gates_x, hs)

    def bwd_rule(reverse, interpret, residuals, dhs):
        w_hh, b_hh, gates_x, hs = residuals

        def local(gx, hs_l, dhs_l, w, bb):
            dgx, dwhh, dbhh = _run_bwd(gx, hs_l, dhs_l, w, bb,
                                       reverse, interpret)
            return (dgx, jax.lax.psum(dwhh, data_axis),
                    jax.lax.psum(dbhh, data_axis))

        dgx, dwhh, dbhh = _sm(
            local, (spec_tb, spec_tb, spec_tb, rep, rep),
            (spec_tb, rep, rep),
        )(gates_x, hs, dhs, w_hh, b_hh)
        return (dgx, dwhh.T.astype(w_hh.dtype),
                dbhh.reshape(-1).astype(b_hh.dtype))

    f.defvjp(fwd_rule, bwd_rule)
    return f
