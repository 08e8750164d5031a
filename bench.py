"""Benchmark: flagship MD_VAE training throughput on the local TPU chip.

Metric: utterance-seconds of audio processed per wall-clock second per chip
while running the FULL fused training step on the heaviest (VAE) target —
forward through all three sub-networks, the on-device Viterbi self-training
decode, backward, clip, and the optimizer update.

The step runs in the framework's AMP mode (``--bf16``, the counterpart of
the reference's sb.Brain ``auto_mix_prec`` AMP path, reference
``md_model.py:54-88``): recurrence/matmul streams in bf16, all loss math,
distribution transforms, carries, params, grads and the Viterbi decode in
f32 (``nn/dist.py`` mirrors torch autocast's fp32 op list; one-step loss
matches f32 to ~1e-5 relative, ``tests/test_mixed_precision.py``).

``vs_baseline``: BASELINE.md's north-star target is >=5x the reference's
A100 throughput; the reference publishes no numbers (BASELINE.json
``published: {}``), so the denominator is an engineering estimate of the
reference implementation, documented here: eager PyTorch step (B=8,
~3-second utterances => 24 utt-sec/batch) at ~0.6 s/step including the
joblib fork-pool CPU decode that runs inside every forward pass
(reference ``decode_utils.py:546-551``) => ~40 utt-sec/sec. The 5x target
is therefore 200 utt-sec/sec/chip, and ``vs_baseline`` reports
measured / 40 (i.e. >5 means the target is beaten).

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

A100_REF_UTT_SEC_PER_SEC = 40.0  # documented estimate (see module docstring)

HOP_SEC = 0.02


def main():
    from mlvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # warm-starts repeat bench runs (cold: ~40 s)

    import jax
    import jax.numpy as jnp
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    B, T, L = 128, 160, 8  # 128 x 3.2-second utterances per step
    import os
    model = build_md_vae(batch_size=B)
    # AMP (bf16 streams, f32 loss math) by default; MLVAE_BENCH_PRECISION=f32
    # reproduces the documented full-f32 figure.
    model.auto_mix_prec = (
        os.environ.get("MLVAE_BENCH_PRECISION", "bf16").lower() != "f32"
    )
    model.target = Target.VAE
    model.init_params()
    batch = synth_batch(batch_size=B, T=T, L=L)
    model.ensure_states(int(batch["feat"][0].shape[-1]))
    model.init_optimizers()

    step = model._get_compiled("train", Stage.TRAIN)
    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(3, jnp.int32)

    # warmup / compile
    params, opt_states, states = model.params, model.opt_states, model.states
    params, opt_states, states, loss, _ = step(
        params, opt_states, states, rng, batch, epoch
    )
    # block_until_ready is unreliable through the axon tunnel; a scalar
    # fetch is a true sync (see docs/PERF.md).
    float(loss)

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_states, states, loss, _ = step(
            params, opt_states, states, jax.random.fold_in(rng, i), batch,
            epoch,
        )
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    utt_sec_per_step = B * T * HOP_SEC
    throughput = utt_sec_per_step / dt
    print(json.dumps({
        "metric": "md_vae_train_throughput",
        "value": round(throughput, 2),
        "unit": "utt-sec/sec/chip",
        "vs_baseline": round(throughput / A100_REF_UTT_SEC_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
