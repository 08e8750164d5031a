"""Micro-benchmark: one LSTM layer fwd+bwd on the real chip.

Times the full layer path (`nn/rnn._lstm_layer`, including the hoisted
input projection and any transposes around the Pallas kernel), not just
the recurrence, so HBM-traffic changes show up end to end.

Usage: python tools/bench_lstm.py [B] [T] [H] [C]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.rnn import _lstm_layer


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    C = int(sys.argv[4]) if len(sys.argv) > 4 else 512

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (T, B, C), jnp.float32) * 0.1  # time-major
    w_ih = jax.random.normal(ks[1], (4 * H, C), jnp.float32) * 0.05
    w_hh = jax.random.normal(ks[2], (4 * H, H), jnp.float32) * 0.05
    b_ih = jax.random.normal(ks[3], (4 * H,), jnp.float32) * 0.05
    b_hh = jnp.zeros((4 * H,), jnp.float32)

    def loss(x, w_ih, w_hh, b_ih):
        # h0/c0 must be None: explicit zero states route to the lax.scan
        # fallback and the Pallas kernel this tool exists to time never runs
        hs, h_last, c_last = _lstm_layer(x, None, None, w_ih, w_hh, b_ih,
                                         b_hh)
        return jnp.sum(hs * hs) + jnp.sum(c_last)

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))

    N = 30

    @jax.jit
    def run(x, w_ih, w_hh, b_ih):
        # N dependent iterations inside ONE dispatch: per-call tunnel RTT
        # (~30 ms) would otherwise swamp the ~10 ms kernel time.
        def body(carry, _):
            x, w_ih = carry
            v, g = grad(x, w_ih, w_hh, b_ih)
            return (x + 0.0 * g[0], w_ih + 0.0 * g[1]), v

        (x, _), vs = jax.lax.scan(body, (x, w_ih), None, length=N)
        return vs[-1]

    float(run(x, w_ih, w_hh, b_ih))  # compile + warm
    t0 = time.perf_counter()
    float(run(x, w_ih, w_hh, b_ih))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"B={B} T={T} H={H} C={C}: {dt:.2f} ms/iter (fwd+bwd, incl. proj)")


if __name__ == "__main__":
    main()
