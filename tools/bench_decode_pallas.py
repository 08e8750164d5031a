"""A/B benchmark: Pallas MD-Viterbi decode kernels vs the lax.scan decoder.

``ops/decode_pallas`` replaces the two time-axis ``lax.scan``s (forward
lattice + backtrace) with sequential-grid Mosaic programs whose DP carry
lives in VMEM, removing the per-step while-loop dispatch that dominates the
decode at its tiny carry sizes (docs/PERF.md).  This tool measures, on the
real chip:

1. the decode alone (``md_viterbi_batch`` vs ``md_viterbi_batch_pallas``) at
   the bench.py shapes, jitted, dispatch included;
2. the full MD_VAE training step with ``MLVAE_PALLAS_DECODE`` off/on (the
   decode runs inside the fused step on the VAE target).

Usage:  python tools/bench_decode_pallas.py [--decode-only]
Emits one JSON object; exits 0 even on failure (structured error field).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

import mlvae_tpu.ops.decode as dec
from mlvae_tpu.ops.decode_pallas import md_viterbi_batch_pallas


def _problem(B=128, T=160, N=12, L=8, seed=0):
    rs = np.random.RandomState(seed)
    log_p_yx = np.log(rs.dirichlet(np.ones(2), size=(B, T, N)) + 1e-6)
    log_p_y = np.log(rs.dirichlet(np.ones(2), size=(N,)) + 1e-6)
    y = rs.randint(0, N, size=(B, L))
    log_p_b = np.log(rs.dirichlet(np.ones(2), size=(B, T)) + 1e-6)
    log_p_pi = np.log(rs.dirichlet(np.ones(2), size=(B, T)) + 1e-6)
    t_lens = np.full((B,), T, np.int32)
    l_lens = np.full((B,), L, np.int32)
    return tuple(jnp.asarray(a) for a in
                 (log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens))


def time_decode(fn, args, iters: int = 50) -> float:
    jit_fn = jax.jit(fn)
    outs = jit_fn(*args)
    jax.block_until_ready(outs)
    int(np.asarray(outs[0])[0, 0])  # true sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = jit_fn(*args)
    int(np.asarray(outs[0])[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms/decode


def time_full_step(pallas: bool, iters: int = 20) -> float:
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    dec.PALLAS_DECODE_ENABLED = pallas
    # the dispatch flag is read at trace time inside the jitted
    # md_viterbi_batch; its cached jaxpr (keyed on avals only) would make
    # the second arm silently reuse the first arm's decode path
    jax.clear_caches()
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
    decode_only = "--decode-only" in sys.argv
    out: dict = {"platform": None}
    try:
        out["platform"] = jax.devices()[0].platform
        # force the scan path for the scan arm regardless of the ambient
        # MLVAE_PALLAS_DECODE (md_viterbi_batch dispatches on this flag)
        dec.PALLAS_DECODE_ENABLED = False
        args = _problem()
        ms_scan = time_decode(dec.md_viterbi_batch, args)
        ms_pall = time_decode(md_viterbi_batch_pallas, args)
        # parity on-device before trusting the timing
        ref = jax.jit(dec.md_viterbi_batch)(*args)
        got = jax.jit(md_viterbi_batch_pallas)(*args)
        match = all(bool(jnp.array_equal(a, b)) for a, b in zip(ref, got))
        out.update(decode_ms_scan=round(ms_scan, 3),
                   decode_ms_pallas=round(ms_pall, 3),
                   decode_speedup=round(ms_scan / ms_pall, 2),
                   on_device_parity=match)
        if not decode_only:
            for pallas in (False, True):
                ups = time_full_step(pallas)
                out[f"step_uttsec_{'pallas' if pallas else 'scan'}_decode"] = \
                    round(ups, 1)
    except Exception as e:  # structured failure, exit 0
        out["error"] = repr(e)[-500:]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
