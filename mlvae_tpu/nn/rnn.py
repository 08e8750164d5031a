"""Scan-based LSTM for TPU.

TPU-first design (replaces the reference's cuDNN ``torch.nn.LSTM``, used by
every module — reference ``modules/*.py``):

* The input projection for ALL timesteps of a layer is hoisted into one large
  ``(B*T, 4H)`` matmul that XLA tiles onto the MXU; only the (cheap) hidden
  recurrence ``h @ W_hh^T`` lives inside ``lax.scan``.
* Weight layout and gate order (i, f, g, o) match torch exactly, so parity
  tests can copy a torch state-dict verbatim and compare outputs bit-close.
* Padded frames are processed like the reference does (it never packs
  sequences), so outputs match on the valid region and downstream masking is
  identical.

Citations: reference usage at ``modules/phoneme_recognizer.py:13``,
``modules/boundary_detector.py:19``, ``modules/decoder.py:14``,
``models/MD_VAE/model.yaml:78-83``.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream, uniform_init
from mlvae_tpu.nn.layers import dropout


def _lstm_cell(gates, c, H: int):
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c = f * c + i * g
    return o * jnp.tanh(c), c


# Pallas recurrence kernel gate: ~2x over lax.scan on v5e (8.7 vs 16.9 ms
# fwd+bwd at B=128, T=160, H=512).  Disabled automatically off-TPU and for
# unaligned shapes.  Under a device mesh the kernel runs per-shard through
# ``jax.shard_map`` (GSPMD cannot partition the custom call itself): the
# Brain publishes the active mesh in PALLAS_LSTM_MESH and each device runs
# the recurrence on its local batch shard.
PALLAS_LSTM_ENABLED = True
PALLAS_LSTM_MESH = None          # set by the Brain via set_pallas_mesh
PALLAS_LSTM_DATA_AXIS = "data"

# Fused input-projection kernel variant (the (T,B,4H) gates tensor never
# touches HBM — docs/PERF.md "headroom" item).  Validated on hardware
# (tools/bench_lstm_fused.py, v5e): bf16 streams win — full AMP step
# 19.9k → 20.8k utt-sec/sec (+4.5%) — while the f32 semifused arm measured
# slightly SLOWER than the hoisted projection (3.14 → 3.23 ms/layer), so
# the default is tri-state "auto" = fused for bf16 streams only.
# MLVAE_PALLAS_FUSED=1 forces both dtypes on, =0 forces off; any other
# value besides "auto" raises (a silently-misparsed A/B flag invalidates
# the comparison).
from mlvae_tpu.utils.envflags import env_tristate
PALLAS_LSTM_FUSED = env_tristate("MLVAE_PALLAS_FUSED", "auto")


def _fused_requested(dtype) -> bool:
    """Whether the fused-projection kernels are requested for this stream
    dtype (eligibility is checked separately per layer shape)."""
    if PALLAS_LSTM_FUSED == "auto":
        return dtype == jnp.bfloat16
    return bool(PALLAS_LSTM_FUSED)


def set_pallas_mesh(mesh) -> None:
    """Publish (or clear, with None) the active device mesh for the Pallas
    recurrence dispatch.  Every Brain init calls this — a later
    single-device Brain in the same process must not inherit an earlier
    Brain's mesh."""
    global PALLAS_LSTM_MESH
    PALLAS_LSTM_MESH = mesh


def _mesh_data_size() -> int:
    if PALLAS_LSTM_MESH is None:
        return 1
    return dict(PALLAS_LSTM_MESH.shape).get(PALLAS_LSTM_DATA_AXIS, 1)


def _pallas_eligible(x, H: int) -> bool:
    if not PALLAS_LSTM_ENABLED:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    B = x.shape[1]
    d = _mesh_data_size()
    # bf16 inputs stream bf16 through the kernel DMA (the recurrence
    # arithmetic and carries stay f32 in VMEM); bf16 blocks need the
    # 16-row sublane tile.  Under a mesh the PER-SHARD batch must stay
    # kernel-aligned.
    align = 16 if x.dtype == jnp.bfloat16 else 8
    return (x.dtype in (jnp.float32, jnp.bfloat16)
            and B % (align * d) == 0 and H % 128 == 0)


def _init_rnn_params(rng, num_layers, directions, input_size, H, n_gates,
                     bias):
    """torch-layout RNN parameter init shared by LSTM (n_gates=4) and GRU
    (n_gates=3).  The key-split structure is identical with and without
    biases so bias=True initialization stays bit-stable."""
    params = {}
    bound = 1.0 / math.sqrt(H)
    idx = 0
    for layer in range(num_layers):
        in_size = input_size if layer == 0 else H * directions
        for direction in range(directions):
            sfx = f"l{layer}" + ("_reverse" if direction == 1 else "")
            keys = jax.random.split(jax.random.fold_in(rng, idx), 4)
            idx += 1
            params[f"weight_ih_{sfx}"] = uniform_init(
                keys[0], (n_gates * H, in_size), bound)
            params[f"weight_hh_{sfx}"] = uniform_init(
                keys[1], (n_gates * H, H), bound)
            if bias:
                params[f"bias_ih_{sfx}"] = uniform_init(
                    keys[2], (n_gates * H,), bound)
                params[f"bias_hh_{sfx}"] = uniform_init(
                    keys[3], (n_gates * H,), bound)
    return params


def _lstm_layer(x, h0, c0, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """Run one unidirectional LSTM layer over TIME-MAJOR (T, B, C) input.

    ``h0``/``c0`` may be None (zero initial state).  The Pallas kernel
    hard-codes zero initial state, so a NON-None initial state routes to
    the scan path — passing a nonzero state into the kernel would silently
    discard it.

    The whole stack runs time-major internally (one transpose at the LSTM
    entry/exit instead of a (T,B,4H)-sized transpose per layer-direction —
    at f32 those per-layer transposes were the largest avoidable HBM stream
    of the training step).

    Returns (hs (T, B, H), h_last (B, H), c_last (B, H)); the finals are the
    state after the last PROCESSED step (for ``reverse=True`` that is t=0,
    matching torch's bidirectional convention).
    """
    H = w_hh.shape[1]

    if h0 is None and c0 is None and _pallas_eligible(x, H):
        from mlvae_tpu.ops.lstm_pallas import (fused_eligible,
                                               semifused_eligible)
        # The fused kernels put the input-feature dim on the 128-wide lane
        # axis; unaligned inputs (fbank's 120, the decoder's latent 32)
        # zero-pad up to the lane tile — the padded x copy costs ~In/16H of
        # the (T,B,4H) gates traffic the fused path removes, and the padded
        # W_ih columns see zero activations so dW_ih rows come back zero
        # (sliced off below via the pad's own VJP).
        In = x.shape[-1]
        In_pad = -(-In // 128) * 128
        fused = None
        fused_req = _fused_requested(x.dtype)
        if fused_req and fused_eligible(In_pad, H, x.dtype):
            # fully fused: the input projection moves INTO the kernel, so
            # the (T,B,4H) gates tensor never exists in HBM; backward
            # accumulates dX/dW_ih/db in-kernel too
            if PALLAS_LSTM_MESH is not None:
                from mlvae_tpu.ops.lstm_pallas import sharded_lstm_layer_fused
                fused = sharded_lstm_layer_fused(PALLAS_LSTM_MESH,
                                                 PALLAS_LSTM_DATA_AXIS)
            else:
                from mlvae_tpu.ops.lstm_pallas import lstm_layer_fused as fused
        elif fused_req and semifused_eligible(In_pad, H, x.dtype):
            # half-fused (wide-input layers, e.g. the bi-decoder's In=2H):
            # fused forward; backward streams x and emits dgx for XLA
            if PALLAS_LSTM_MESH is not None:
                from mlvae_tpu.ops.lstm_pallas import \
                    sharded_lstm_layer_semifused
                fused = sharded_lstm_layer_semifused(PALLAS_LSTM_MESH,
                                                     PALLAS_LSTM_DATA_AXIS)
            else:
                from mlvae_tpu.ops.lstm_pallas import \
                    lstm_layer_semifused as fused
        if fused is not None:
            bias = b_ih + b_hh
            if not hasattr(bias, "shape") or bias.shape != (4 * H,):
                bias = jnp.zeros((4 * H,), jnp.float32) + bias
            x_k, w_ih_k = x, w_ih
            if In_pad != In:
                x_k = jnp.pad(x, ((0, 0), (0, 0), (0, In_pad - In)))
                w_ih_k = jnp.pad(w_ih, ((0, 0), (0, In_pad - In)))
            hs, c_last = fused(x_k, w_ih_k.astype(x.dtype),
                               bias.astype(jnp.float32),
                               w_hh.astype(x.dtype), reverse)
            h_last = hs[0] if reverse else hs[-1]
            return (hs.astype(x.dtype), h_last.astype(x.dtype),
                    c_last.astype(x.dtype))

    # One big MXU matmul for all timesteps, emitted directly in time-major
    # layout — no transpose between the projection and the recurrence.
    gates_x = (
        jnp.einsum("tbc,gc->tbg", x, w_ih, preferred_element_type=x.dtype)
        + b_ih
        + b_hh
    )  # (T, B, 4H)

    if h0 is None and c0 is None and _pallas_eligible(x, H):
        if PALLAS_LSTM_MESH is not None:
            from mlvae_tpu.ops.lstm_pallas import sharded_lstm_layer
            pallas_lstm = sharded_lstm_layer(PALLAS_LSTM_MESH,
                                             PALLAS_LSTM_DATA_AXIS)
        else:
            from mlvae_tpu.ops.lstm_pallas import lstm_layer as pallas_lstm
        # the reverse direction is handled by the kernel's index maps —
        # no materialized jnp.flip of (T,B,4H)/(T,B,H) tensors.  gates_x
        # and w_hh keep their native dtype: under AMP (bf16) the gate
        # streams halve and the recurrence dots run as single bf16 MXU
        # passes with f32 accumulation; carries stay f32 in VMEM either
        # way.  In f32 mode the kernel math is exact f32.
        hs, c_last = pallas_lstm(gates_x, w_hh.astype(x.dtype), reverse)
        h_last = hs[0] if reverse else hs[-1]
        return (hs.astype(x.dtype), h_last.astype(x.dtype),
                c_last.astype(x.dtype))

    w_hh_t = w_hh.T  # (H, 4H)
    B = x.shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), x.dtype)

    def step(carry, gx):
        h, c = carry
        h, c = _lstm_cell(gx + h @ w_hh_t, c, H)
        return (h, c), h

    (h_last, c_last), hs = jax.lax.scan(step, (h0, c0), gates_x,
                                        reverse=reverse)
    return hs, h_last, c_last  # (T, B, H)


def _bilstm_layer(x, w_ih_f, w_hh_f, b_f, w_ih_b, w_hh_b, b_b):
    """Bidirectional layer over time-major input: forward + reverse scans,
    outputs concatenated on the feature axis.

    NOTE(perf): a fused single-scan variant (both directions carried in one
    scan, measured both block-diagonal and two-matmul forms) was tried and
    REGRESSED small-batch training (B=32: 18.6 -> 24.2 ms/step on v5e) while
    gaining only ~6% at B=128 — the concat/slice traffic inside the step
    outweighs the saved scan overhead.  Keep the simple form; a Pallas LSTM
    kernel is the real next lever.
    """
    fwd, h_f, c_f = _lstm_layer(x, None, None, w_ih_f, w_hh_f, b_f, 0.0)
    bwd, h_b, c_b = _lstm_layer(x, None, None, w_ih_b, w_hh_b, b_b, 0.0,
                                reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1), [(h_f, c_f), (h_b, c_b)]


class LSTM(Module):
    """Multi-layer (optionally bidirectional) LSTM.

    Constructor kwargs intentionally mirror ``torch.nn.LSTM`` so reference
    YAMLs (``!new:torch.nn.LSTM``) construct it unmodified.  Only
    ``batch_first=True`` usage is supported (all reference call sites use it).

    apply returns ``(output, (h_n, c_n))`` like torch; callers index ``[0]``.
    """

    def __init__(
        self,
        input_size: int,
        hidden_size: int,
        num_layers: int = 1,
        batch_first: bool = True,
        dropout: float = 0.0,
        bidirectional: bool = False,
        bias: bool = True,
    ):
        super().__init__()
        self.input_size = int(input_size)
        self.hidden_size = int(hidden_size)
        self.num_layers = int(num_layers)
        self.batch_first = bool(batch_first)
        self.dropout = float(dropout)
        self.bidirectional = bool(bidirectional)
        self.bias = bool(bias)

    def _directions(self):
        return 2 if self.bidirectional else 1

    def init(self, rng):
        return _init_rnn_params(rng, self.num_layers, self._directions(),
                                self.input_size, self.hidden_size, 4,
                                self.bias)

    def _bias(self, params, name):
        # torch bias=False: no bias params exist and none are added
        return params[name] if self.bias else 0.0

    def apply(self, params, x, rng=None, train: bool = False, **kwargs):
        assert self.batch_first, "only batch_first=True is supported"
        B = x.shape[0]
        H = self.hidden_size
        stream = RngStream.ensure(rng) if (train and self.dropout > 0) else None

        # run the whole stack time-major; transpose once in and once out
        out = jnp.swapaxes(x, 0, 1)  # (T, B, C)
        last_h = []
        last_c = []
        for layer in range(self.num_layers):
            if self.bidirectional:
                out, finals = _bilstm_layer(
                    out,
                    params[f"weight_ih_l{layer}"],
                    params[f"weight_hh_l{layer}"],
                    self._bias(params, f"bias_ih_l{layer}")
                    + self._bias(params, f"bias_hh_l{layer}"),
                    params[f"weight_ih_l{layer}_reverse"],
                    params[f"weight_hh_l{layer}_reverse"],
                    self._bias(params, f"bias_ih_l{layer}_reverse")
                    + self._bias(params, f"bias_hh_l{layer}_reverse"),
                )
                for h_f, c_f in finals:
                    last_h.append(h_f)
                    last_c.append(c_f)
            else:
                out, h_last, c_last = _lstm_layer(
                    out, None, None,
                    params[f"weight_ih_l{layer}"],
                    params[f"weight_hh_l{layer}"],
                    self._bias(params, f"bias_ih_l{layer}"),
                    self._bias(params, f"bias_hh_l{layer}"),
                )
                last_h.append(h_last)
                last_c.append(c_last)
            # torch applies dropout on every layer's output except the last.
            if layer < self.num_layers - 1 and self.dropout > 0 and train:
                out = dropout(stream.next(), out, self.dropout, train)

        h_n = jnp.stack(last_h, axis=0)
        c_n = jnp.stack(last_c, axis=0)
        return jnp.swapaxes(out, 0, 1), (h_n, c_n)  # back to (B, T, H)


def _gru_layer(x, h0, w_ih, w_hh, b_ih, b_hh, reverse: bool = False):
    """One unidirectional GRU layer over TIME-MAJOR (T, B, C) input.

    torch gate order (r, z, n) and semantics: the hidden-side bias of the
    candidate gate sits INSIDE the reset product
    (``n = tanh(gx_n + r * (h @ W_hn^T + b_hn))``), so only the input
    projection (+ b_ih) is hoisted out of the scan; the hidden projection
    stays inside.  Replaces ``torch.nn.GRU`` call sites (BASELINE.json
    north star names conv/GRU/dense VAE stacks).
    """
    H = w_hh.shape[1]
    gates_x = (
        jnp.einsum("tbc,gc->tbg", x, w_ih, preferred_element_type=x.dtype)
        + b_ih
    )  # (T, B, 3H)

    # the Pallas kernel hard-codes zero initial state (see _lstm_layer)
    if h0 is None and _pallas_eligible(x, H):
        if PALLAS_LSTM_MESH is not None:
            from mlvae_tpu.ops.gru_pallas import sharded_gru_layer
            pallas_gru = sharded_gru_layer(PALLAS_LSTM_MESH,
                                           PALLAS_LSTM_DATA_AXIS)
        else:
            from mlvae_tpu.ops.gru_pallas import gru_layer as pallas_gru
        hs = pallas_gru(gates_x, w_hh.astype(x.dtype),
                        b_hh.astype(jnp.float32), reverse)
        h_last = hs[0] if reverse else hs[-1]
        return hs.astype(x.dtype), h_last.astype(x.dtype)

    w_hh_t = w_hh.T  # (H, 3H)
    if h0 is None:
        h0 = jnp.zeros((x.shape[1], H), x.dtype)

    def step(h, gx):
        gh = h @ w_hh_t + b_hh
        r = jax.nn.sigmoid(gx[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gx[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gx[:, 2 * H:] + r * gh[:, 2 * H:])
        h = (1.0 - z) * n + z * h
        return h, h

    h_last, hs = jax.lax.scan(step, h0, gates_x, reverse=reverse)
    return hs, h_last


class GRU(Module):
    """Multi-layer (optionally bidirectional) GRU with ``torch.nn.GRU``
    constructor/weight-layout parity (``!new:torch.nn.GRU`` YAML tag).

    apply returns ``(output, h_n)`` like torch; callers index ``[0]``.
    """

    def __init__(self, input_size: int, hidden_size: int,
                 num_layers: int = 1, batch_first: bool = True,
                 dropout: float = 0.0, bidirectional: bool = False,
                 bias: bool = True):
        super().__init__()
        self.input_size = int(input_size)
        self.hidden_size = int(hidden_size)
        self.num_layers = int(num_layers)
        self.batch_first = bool(batch_first)
        self.dropout = float(dropout)
        self.bidirectional = bool(bidirectional)
        self.bias = bool(bias)

    def _directions(self):
        return 2 if self.bidirectional else 1

    def init(self, rng):
        return _init_rnn_params(rng, self.num_layers, self._directions(),
                                self.input_size, self.hidden_size, 3,
                                self.bias)

    def _bias_arr(self, params, name, dtype):
        if self.bias:
            return params[name]
        return jnp.zeros((3 * self.hidden_size,), dtype)

    def apply(self, params, x, rng=None, train: bool = False, **kwargs):
        assert self.batch_first, "only batch_first=True is supported"
        B = x.shape[0]
        H = self.hidden_size
        stream = RngStream.ensure(rng) if (train and self.dropout > 0) \
            else None

        out = jnp.swapaxes(x, 0, 1)  # (T, B, C)
        last_h = []
        for layer in range(self.num_layers):
            if self.bidirectional:
                sfx = f"l{layer}"
                fwd, h_f = _gru_layer(
                    out, None, params[f"weight_ih_{sfx}"],
                    params[f"weight_hh_{sfx}"],
                    self._bias_arr(params, f"bias_ih_{sfx}", out.dtype),
                    self._bias_arr(params, f"bias_hh_{sfx}", out.dtype))
                bwd, h_b = _gru_layer(
                    out, None, params[f"weight_ih_{sfx}_reverse"],
                    params[f"weight_hh_{sfx}_reverse"],
                    self._bias_arr(params, f"bias_ih_{sfx}_reverse",
                                   out.dtype),
                    self._bias_arr(params, f"bias_hh_{sfx}_reverse",
                                   out.dtype), reverse=True)
                out = jnp.concatenate([fwd, bwd], axis=-1)
                last_h.extend([h_f, h_b])
            else:
                out, h_last = _gru_layer(
                    out, None, params[f"weight_ih_l{layer}"],
                    params[f"weight_hh_l{layer}"],
                    self._bias_arr(params, f"bias_ih_l{layer}", out.dtype),
                    self._bias_arr(params, f"bias_hh_l{layer}", out.dtype))
                last_h.append(h_last)
            if layer < self.num_layers - 1 and self.dropout > 0 and train:
                out = dropout(stream.next(), out, self.dropout, train)

        h_n = jnp.stack(last_h, axis=0)
        return jnp.swapaxes(out, 0, 1), h_n  # back to (B, T, H)
