"""A/B micro+macro benchmark: fused-projection Pallas LSTM vs the hoisted
projection + recurrence-only kernel.

The fused kernel (``ops/lstm_pallas.lstm_layer_fused``) keeps the input
projection inside the Mosaic program so the (T,B,4H) gates tensor never
touches HBM — the modelled ~35% step-byte cut from docs/PERF.md.  This tool
measures, on the real chip:

1. one LSTM layer fwd+bwd through ``nn/rnn._lstm_layer`` (dispatch included)
   with the fused path off/on, bf16 and f32 streams;
2. the full MD_VAE training step (bench.py shapes) off/on under AMP.

Usage:  python tools/bench_lstm_fused.py [--layer-only]
Emits one JSON object; exits 0 even on failure (structured error field).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import mlvae_tpu.nn.rnn as rnn


def time_layer(B, T, H, C, dtype, fused: bool, iters: int = 30) -> float:
    rnn.PALLAS_LSTM_FUSED = fused
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = (jax.random.normal(ks[0], (T, B, C), jnp.float32) * 0.1).astype(dtype)
    w_ih = (jax.random.normal(ks[1], (4 * H, C), jnp.float32) * 0.05
            ).astype(dtype)
    w_hh = (jax.random.normal(ks[2], (4 * H, H), jnp.float32) * 0.05
            ).astype(dtype)
    b_ih = jax.random.normal(ks[3], (4 * H,), jnp.float32) * 0.05
    b_hh = jnp.zeros((4 * H,), jnp.float32)

    def loss(x, w_ih, w_hh, b_ih):
        hs, h_last, c_last = rnn._lstm_layer(
            x, None, None, w_ih, w_hh, b_ih, b_hh)
        return (jnp.sum((hs * hs).astype(jnp.float32))
                + jnp.sum(c_last.astype(jnp.float32)))

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

    @jax.jit
    def run(x, w_ih, w_hh, b_ih):
        def body(carry, _):
            x, w_ih = carry
            v, g = grad(x, w_ih, w_hh, b_ih)
            return (x + (0.0 * g[0]).astype(x.dtype),
                    w_ih + (0.0 * g[1]).astype(w_ih.dtype)), v

        (x, _), vs = jax.lax.scan(body, (x, w_ih), None, length=iters)
        return vs[-1]

    float(run(x, w_ih, w_hh, b_ih))  # compile + warm
    t0 = time.perf_counter()
    float(run(x, w_ih, w_hh, b_ih))
    return (time.perf_counter() - t0) / iters * 1e3  # ms/layer fwd+bwd


def time_full_step(fused: bool, iters: int = 20) -> float:
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    rnn.PALLAS_LSTM_FUSED = fused
    B, T, L = 128, 160, 8
    model = build_md_vae(batch_size=B)
    model.auto_mix_prec = True
    model.target = Target.VAE
    model.init_params()
    batch = synth_batch(batch_size=B, T=T, L=L)
    model.ensure_states(int(batch["feat"][0].shape[-1]))
    model.init_optimizers()
    step = model._get_compiled("train", Stage.TRAIN)
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(3, jnp.int32)
    params, opt_states, states = model.params, model.opt_states, model.states
    params, opt_states, states, lossv, _ = step(
        params, opt_states, states, rng, batch, epoch)
    float(lossv)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_states, states, lossv, _ = step(
            params, opt_states, states, jax.random.fold_in(rng, i), batch,
            epoch)
    float(lossv)
    dt = (time.perf_counter() - t0) / iters
    return B * T * 0.02 / dt  # utt-sec/sec


def main() -> None:
    layer_only = "--layer-only" in sys.argv
    out: dict = {"platform": None}
    try:
        out["platform"] = jax.devices()[0].platform
        from mlvae_tpu.ops.lstm_pallas import (fused_eligible,
                                               semifused_eligible)
        for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            # record which kernel the fused arm actually dispatches to at
            # this (In, H, dtype) — e.g. f32 In=H=512 is over the
            # full-fused VMEM budget and runs the SEMIFUSED kernel
            if fused_eligible(512, 512, dtype):
                tier = "fused"
            elif semifused_eligible(512, 512, dtype):
                tier = "semifused"
            else:
                tier = "unfused"
            out[f"fused_arm_kernel_{name}"] = tier
            for fused in (False, True):
                ms = time_layer(128, 160, 512, 512, dtype, fused)
                out[f"layer_ms_{name}_{'fused' if fused else 'unfused'}"] = \
                    round(ms, 3)
        if not layer_only:
            for fused in (False, True):
                ups = time_full_step(fused)
                out[f"step_uttsec_{'fused' if fused else 'unfused'}"] = \
                    round(ups, 1)
    except Exception as e:  # structured failure, exit 0
        out["error"] = repr(e)[-500:]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
