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

from mlvae_tpu.ops.lstm_pallas import (_b_block, _b_block_bwd, _sublane,
                                       _time_map)


def _fwd_kernel(gx_ref, whh_t_ref, bhh_ref, hs_ref, *rest,
                H: int, save_f32: bool):
    if save_f32:
        hs32_ref, h_scr = rest
    else:
        (h_scr,) = rest
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
    if save_f32:
        # exact f32 carry trajectory for the backward's elementwise chain
        # (same rationale as the LSTM kernel's f32 cs): the forward's
        # z*h term uses the EXACT f32 h, so the backward's dz/dh chain
        # must too — reconstructing it from bf16-rounded hs injects
        # O(2^-8) error per step into a T-long multiplicative chain
        hs32_ref[0] = h_new
    h_scr[:] = h_new


def _bwd_kernel(gx_ref, hs_prev_ref, *rest, H: int, has_f32: bool):
    if has_f32:
        (hs32_prev_ref, dhs_ref, whh_t_ref, bhh_ref,
         dgx_ref, dwhh_ref, dbhh_ref, dh_scr) = rest
    else:
        (dhs_ref, whh_t_ref, bhh_ref,
         dgx_ref, dwhh_ref, dbhh_ref, dh_scr) = rest
        hs32_prev_ref = hs_prev_ref
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
    # stream-dtype h_prev for the MXU dots: the forward cast h to the
    # weight dtype for its dot, so bf16 here is the EXACT cotangent of the
    # op the forward ran.  The f32 view feeds only the elementwise chain.
    h_prev = hs_prev_ref[0] * valid.astype(hs_prev_ref.dtype)
    h_prev_f = hs32_prev_ref[0].astype(jnp.float32) * valid

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
    w_hh: (3H, H) torch layout; b_hh: (3H,).

    Returns (hs, hs32): hs in the stream dtype for consumers; hs32 the
    exact f32 carry trajectory for the backward (None in f32 mode, where
    hs itself is exact)."""
    T, B, G = gates_x.shape
    H = G // 3
    BB = _b_block(B, align=_sublane(gates_x.dtype))
    tm = _time_map(T, reverse)
    save_f32 = gates_x.dtype != jnp.float32
    out_specs = [pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), gates_x.dtype)]
    if save_f32:
        out_specs.append(pl.BlockSpec((1, BB, H), tm,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, B, H), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, save_f32=save_f32),
        grid=(B // BB, T),
        in_specs=[
            pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((BB, H), jnp.float32)],
        interpret=interpret,
    )(gates_x, w_hh.T, b_hh.reshape(1, G))
    if save_f32:
        return outs[0], outs[1]
    return outs[0], None


def _run_bwd(gates_x, hs, hs32, dhs, w_hh, b_hh, reverse: bool,
             interpret: bool):
    T, B, H = hs.shape
    G = 3 * H
    BB = _b_block_bwd(B, gates_x.dtype)
    tm = _time_map(T, not reverse)
    if reverse:
        tm_prev = lambda b, r: (jnp.minimum(r + 1, T - 1), b, 0)
    else:
        tm_prev = lambda b, r: (jnp.maximum(T - 2 - r, 0), b, 0)
    has_f32 = hs32 is not None
    in_specs = [
        pl.BlockSpec((1, BB, G), tm, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BB, H), tm_prev, memory_space=pltpu.VMEM),
    ]
    args = [gates_x, hs]
    if has_f32:
        in_specs.append(pl.BlockSpec((1, BB, H), tm_prev,
                                     memory_space=pltpu.VMEM))
        args.append(hs32)
    in_specs += [
        pl.BlockSpec((1, BB, H), tm, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, G), lambda b, r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G), lambda b, r: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [dhs, w_hh.T, b_hh.reshape(1, G)]
    dgx, dwhh, dbhh = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, has_f32=has_f32),
        grid=(B // BB, T),
        in_specs=in_specs,
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
    )(*args)
    return dgx, dwhh, dbhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gru_layer(gates_x, w_hh, b_hh, reverse: bool = False,
              interpret: bool = False):
    """Pallas GRU recurrence: (T, B, 3H) input-side pre-gates + (3H, H)
    W_hh + (3H,) b_hh -> (T, B, H) hidden states in natural time order."""
    return _run_fwd(gates_x, w_hh, b_hh, reverse, interpret)[0]


def _vjp_fwd(gates_x, w_hh, b_hh, reverse, interpret):
    hs, hs32 = _run_fwd(gates_x, w_hh, b_hh, reverse, interpret)
    return hs, (w_hh, b_hh, gates_x, hs, hs32)


def _vjp_bwd(reverse, interpret, residuals, dhs):
    w_hh, b_hh, gates_x, hs, hs32 = residuals
    dgx, dwhh, dbhh = _run_bwd(gates_x, hs, hs32, dhs, w_hh, b_hh,
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
        save_f32 = gates_x.dtype != jnp.float32
        return _sm(
            functools.partial(_run_fwd, reverse=reverse,
                              interpret=interpret),
            (spec_tb, rep, rep),
            (spec_tb, spec_tb) if save_f32 else (spec_tb, None),
        )(gates_x, w_hh, b_hh)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def f(gates_x, w_hh, b_hh, reverse: bool = False,
          interpret: bool = False):
        return _fwd(gates_x, w_hh, b_hh, reverse, interpret)[0]

    def fwd_rule(gates_x, w_hh, b_hh, reverse, interpret):
        hs, hs32 = _fwd(gates_x, w_hh, b_hh, reverse, interpret)
        return hs, (w_hh, b_hh, gates_x, hs, hs32)

    def bwd_rule(reverse, interpret, residuals, dhs):
        w_hh, b_hh, gates_x, hs, hs32 = residuals
        has_f32 = hs32 is not None

        def local(gx, hs_l, dhs_l, w, bb, *maybe_hs32):
            hs32_l = maybe_hs32[0] if maybe_hs32 else None
            dgx, dwhh, dbhh = _run_bwd(gx, hs_l, hs32_l, dhs_l, w, bb,
                                       reverse, interpret)
            return (dgx, jax.lax.psum(dwhh, data_axis),
                    jax.lax.psum(dbhh, data_axis))

        in_specs = (spec_tb, spec_tb, spec_tb, rep, rep) + \
            ((spec_tb,) if has_f32 else ())
        args = (gates_x, hs, dhs, w_hh, b_hh) + \
            ((hs32,) if has_f32 else ())
        dgx, dwhh, dbhh = _sm(local, in_specs, (spec_tb, rep, rep))(*args)
        return (dgx, dwhh.T.astype(w_hh.dtype),
                dbhh.reshape(-1).astype(b_hh.dtype))

    f.defvjp(fwd_rule, bwd_rule)
    return f
