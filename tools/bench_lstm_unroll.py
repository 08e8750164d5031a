"""Hardware A/B: K-step time-unrolled Pallas LSTM forward kernels
(``ops/lstm_unroll_exp``) vs the production 1-step kernels
(``ops/lstm_pallas``).

Tests the docs/PERF.md "latency-bound" hypothesis at the kernel level:
if the sequential grid's per-iteration fixed cost dominates, K
consecutive time steps per grid iteration should cut forward wall time
toward 1/K.  The fused variant additionally batches the K input
projections into one (K*BB, In) @ (In, 4H) MXU dot.

Measures, on the real chip, forward-only wall time per layer at the
flagship shapes (B=128, T=160, H=512, bf16 + f32), plus on-device
parity of each unrolled arm against its production twin.

Usage: python tools/bench_lstm_unroll.py [--iters N]
Emits one JSON object; exits 0 even on failure (structured error field).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from mlvae_tpu.ops import lstm_pallas as lp
from mlvae_tpu.ops import lstm_unroll_exp as lu


def _loop_ms(kernel, gx, *weights, reps: int = 50, rounds: int = 3) -> float:
    """Per-call ms of ``kernel(gx, *weights)`` measured through a
    device-side fori_loop (tunnel RTT here is ~24 ms, dwarfing the
    kernel; the loop amortizes it).  A scalar from each output is folded
    into the next input so iterations cannot be batched/elided."""

    @jax.jit
    def run(gx):
        def body(_, g):
            outs = kernel(g, *weights)
            # optimization_barrier makes the data dependency opaque to XLA:
            # a `h*0` arithmetic guard could be constant-folded by a future
            # fast-math-style simplification, silently timing an empty loop
            h = jax.lax.optimization_barrier(outs[0])
            return g + (h[0, 0, 0] * 0).astype(g.dtype)

        return jax.lax.fori_loop(0, reps, body, gx)

    jax.block_until_ready(run(gx))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(run(gx))
        best = min(best, (time.perf_counter() - t0) * 1e3 / reps)
    return best


def bench(B: int, T: int, H: int, In: int, dtype, iters: int) -> dict:
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = (jax.random.normal(ks[0], (T, B, In), jnp.float32) * 0.1
         ).astype(dtype)
    gx = (jax.random.normal(ks[1], (T, B, 4 * H), jnp.float32) * 0.1
          ).astype(dtype)
    w_ih = (jax.random.normal(ks[2], (4 * H, In), jnp.float32) * 0.05
            ).astype(dtype)
    w_hh = (jax.random.normal(ks[3], (4 * H, H), jnp.float32) * 0.05
            ).astype(dtype)
    bias = jnp.zeros((4 * H,), jnp.float32)

    res = {"shape": f"B{B}xT{T}xH{H}xIn{In}", "dtype": str(dtype.__name__)}

    plain_base = lambda g, w: lp._run_fwd(g, w, False, False)
    hs0, _ = jax.jit(plain_base)(gx, w_hh)
    res["plain_1step_ms"] = _loop_ms(plain_base, gx, w_hh, reps=iters)
    print(f"# plain_1step {res['plain_1step_ms']:.3f} ms", file=sys.stderr, flush=True)

    for K in (2, 4, 8):
        if T % K:
            continue
        fn = lambda g, w, K=K: lu.run_fwd_k(g, w, False, K)
        try:
            hs, _ = jax.jit(fn)(gx, w_hh)
            res[f"plain_K{K}_max_abs"] = float(
                jnp.max(jnp.abs(hs.astype(jnp.float32)
                                - hs0.astype(jnp.float32))))
            res[f"plain_K{K}_ms"] = _loop_ms(fn, gx, w_hh, reps=iters)
            print(f"# plain_K{K} {res[f'plain_K{K}_ms']:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:  # VMEM blowups at large K are data too
            res[f"plain_K{K}_error"] = repr(e)[:200]

    fused_base = lambda x, wi, b, wh: lp._run_fwd_fused(
        x, wi, b, wh, False, False)
    hsf0, _ = jax.jit(fused_base)(x, w_ih, bias, w_hh)
    res["fused_1step_ms"] = _loop_ms(fused_base, x, w_ih, bias, w_hh,
                                     reps=iters)
    print(f"# fused_1step {res['fused_1step_ms']:.3f} ms", file=sys.stderr, flush=True)

    for K in (2, 4, 8):
        if T % K:
            continue
        fn = lambda x, wi, b, wh, K=K: lu.run_fwd_fused_k(
            x, wi, b, wh, False, K)
        try:
            hs, _ = jax.jit(fn)(x, w_ih, bias, w_hh)
            res[f"fused_K{K}_max_abs"] = float(
                jnp.max(jnp.abs(hs.astype(jnp.float32)
                                - hsf0.astype(jnp.float32))))
            res[f"fused_K{K}_ms"] = _loop_ms(fn, x, w_ih, bias, w_hh,
                                             reps=iters)
            print(f"# fused_K{K} {res[f'fused_K{K}_ms']:.3f} ms", file=sys.stderr, flush=True)
        except Exception as e:
            res[f"fused_K{K}_error"] = repr(e)[:200]
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    # default matches the recorded docs/lstm_unroll_ab.json run
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    out = {"tool": "bench_lstm_unroll", "device": None,
           "iters": args.iters, "results": []}
    try:
        out["device"] = str(jax.devices()[0])
        for dtype in (jnp.bfloat16, jnp.float32):
            out["results"].append(bench(128, 160, 512, 512, dtype,
                                        args.iters))
    except Exception as e:
        out["error"] = repr(e)[:500]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
