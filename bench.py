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
A100 throughput.  The reference publishes no numbers (BASELINE.json
``published: {}``), so the denominator is MEASURED: ``tools/bench_torch_ref.py``
times a faithful torch re-implementation of the reference training step
(fit_batch + the in-forward joblib/threaded CPU Viterbi decode, reference
``md_model.py:54-88`` + ``MD_VAE/model.py:61-160`` + ``decode_utils.py:546-551``)
on this host, and docs/PERF.md documents the host->A100 scaling argument.
See ``A100_REF_UTT_SEC_PER_SEC`` below for the resulting figure.  The 5x
gate is ``vs_baseline >= 5``.

Robustness: the axon TPU tunnel has multi-hour outages (round-1 bench died
with a raw traceback, BENCH_r01.json rc=1 parsed=null; round-2's first
driver attempt hit a flap between the probe and the in-process backend
init, BENCH_r02 n=1 rc=1).  This script is therefore a SUPERVISOR:
(a) it probes the backend in a bounded subprocess and waits/retries for up
to ``MLVAE_BENCH_PROBE_SECS`` (default 1800 s) for the tunnel to return,
(b) it runs the actual measurement in a bounded SUBPROCESS
(``python bench.py --measure``) and retries the whole probe+measure cycle
on any failure until the deadline — a failed in-process jax init would
poison the client for the rest of the run, a subprocess is disposable —
and (c) it prints exactly ONE JSON line on EVERY exit path — a real
measurement, or a structured ``{"error": ...}`` report — and always
exits 0 from supervisor mode.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Measured reference baseline (see tools/bench_torch_ref.py + docs/PERF.md):
# torch re-implementation of the reference MD_VAE fit_batch on this host,
# scaled to A100 per the documented argument.  Falls back to the round-1
# engineering estimate only if the measurement file is absent.
_BASELINE_FILE = Path(__file__).resolve().parent / "docs" / "torch_ref_baseline.json"
A100_REF_UTT_SEC_PER_SEC = 40.0  # pre-measurement fallback
_BASELINE_SOURCE = "estimate"
if _BASELINE_FILE.exists():
    try:
        _b = json.loads(_BASELINE_FILE.read_text())
        A100_REF_UTT_SEC_PER_SEC = float(_b["a100_utt_sec_per_sec"])
        _BASELINE_SOURCE = "measured:" + str(_b.get("measured_on", "host"))
    except Exception:
        pass

HOP_SEC = 0.02

PROBE_CODE = "import jax; jax.devices()[0]"


def emit(payload: dict) -> None:
    """The single stdout JSON line the driver parses."""
    sys.stdout.write(json.dumps(payload) + "\n")
    sys.stdout.flush()


def error_payload(kind: str, detail: str = "", **extra) -> dict:
    p = {
        "metric": "md_vae_train_throughput",
        "value": 0.0,
        "unit": "utt-sec/sec/chip",
        "vs_baseline": 0.0,
        "error": kind,
    }
    if detail:
        p["detail"] = detail[-800:]
    p.update(extra)
    return p


def probe_backend(total_wait_s: float) -> tuple[bool, float]:
    """Probe ``jax.devices()`` in a bounded subprocess; wait and retry until
    the backend answers or the deadline passes.  A subprocess is used because
    a failed in-process backend init can poison the jax client for the rest
    of the run (and a hung tunnel init ignores SIGINT but not SIGKILL)."""
    deadline = time.monotonic() + total_wait_s
    waited0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE_CODE],
                timeout=180,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            if r.returncode == 0:
                return True, time.monotonic() - waited0
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False, time.monotonic() - waited0
        # bounded backoff: outages are hour-scale, probe every 60 s
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


def run_bench() -> dict:
    from mlvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()  # warm-starts repeat bench runs (cold: ~40 s)

    import jax
    import jax.numpy as jnp
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    platform = jax.devices()[0].platform

    # 3.2-second utterances; B=256 is the v5e chip's saturation knee for
    # this LSTM-bound step (measured r5: B=128 -> 21.9k, 256 -> 23.3k,
    # 512 -> 23.4k utt-sec/sec — the T=160 recurrences underfill the MXU
    # at small B, and past 256 the step is compute-bound).
    B, T, L = 256, 160, 8
    # test hooks (CPU smoke tests only — the driver runs the defaults):
    B = int(os.environ.get("MLVAE_BENCH_B", B))
    T = int(os.environ.get("MLVAE_BENCH_T", T))
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

    rng = jax.random.PRNGKey(0)
    epoch = jnp.asarray(3, jnp.int32)
    params, opt_states, states = model.params, model.opt_states, model.states

    # Dispatch granularity.  The production fit loop runs epochs as
    # lax.scan over stacked same-shape batches (--scan_epoch, the default
    # in every corpus campaign; brain._fit_epoch_scanned) precisely
    # because the per-step path is dispatch-latency-bound through the
    # axon tunnel (docs/PERF.md "bench session-variance").  The bench
    # measures the same granularity: K steps per dispatch via the SAME
    # scan builder the fit loop uses (brain._get_scan_fn).
    # MLVAE_BENCH_SCAN_K=1 reproduces the per-step dispatch figure.
    K = max(1, int(os.environ.get("MLVAE_BENCH_SCAN_K", "10")))
    iters = 30  # total steps measured, at any K

    def sync(x):
        # block_until_ready is unreliable through the axon tunnel; a
        # scalar fetch is a true sync (see docs/PERF.md).
        return float(jnp.ravel(x)[-1])

    mode = "per-step dispatch"
    if K > 1:
        try:
            scan_fn = model._get_scan_fn(("bench", K), K)
            stacked = jax.tree.map(lambda x: jnp.stack([x] * K), batch)

            def rngs_for(d):
                return jnp.stack(
                    [jax.random.fold_in(rng, d * K + j) for j in range(K)]
                )

            n_dispatch = max(1, iters // K)
            (params, opt_states, states), (loss, _) = scan_fn(
                params, opt_states, states, rngs_for(n_dispatch), stacked,
                epoch,
            )
            sync(loss)
            t0 = time.perf_counter()
            for d in range(n_dispatch):
                (params, opt_states, states), (loss, _) = scan_fn(
                    params, opt_states, states, rngs_for(d), stacked, epoch
                )
            sync(loss)
            dt = (time.perf_counter() - t0) / (n_dispatch * K)
            mode = f"scan-epoch dispatch (K={K})"
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            sys.stderr.write("bench: scan mode failed, falling back to "
                             "per-step dispatch\n")
            # the failed dispatch may already have DONATED the state
            # buffers (scan_fn donates argnums 0-2) — rebuild them so the
            # fallback below never touches deleted arrays
            model.init_params()
            model.ensure_states(int(batch["feat"][0].shape[-1]))
            model.init_optimizers()
            params, opt_states, states = (
                model.params, model.opt_states, model.states
            )
            K = 1  # fall through to the per-step loop below
    if K == 1:
        step = model._get_compiled("train", Stage.TRAIN)
        params, opt_states, states, loss, _ = step(
            params, opt_states, states, rng, batch, epoch
        )
        sync(loss)
        t0 = time.perf_counter()
        for i in range(iters):
            params, opt_states, states, loss, _ = step(
                params, opt_states, states, jax.random.fold_in(rng, i),
                batch, epoch,
            )
        sync(loss)
        dt = (time.perf_counter() - t0) / iters

    utt_sec_per_step = B * T * HOP_SEC
    throughput = utt_sec_per_step / dt
    return {
        "metric": "md_vae_train_throughput",
        "value": round(throughput, 2),
        "unit": "utt-sec/sec/chip",
        "vs_baseline": round(throughput / A100_REF_UTT_SEC_PER_SEC, 2),
        "platform": platform,
        "mode": mode,
        "baseline_utt_sec_per_sec": A100_REF_UTT_SEC_PER_SEC,
        "baseline_source": _BASELINE_SOURCE,
    }


def measure_subprocess(timeout_s: float) -> tuple[dict | None, str]:
    """Run the measurement in a disposable subprocess; return (payload, err).
    The child prints the JSON line last on stdout; any warning noise above
    it is skipped."""
    try:
        r = subprocess.run(
            [sys.executable, str(Path(__file__).resolve()), "--measure"],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None, f"measure subprocess hung past {timeout_s:.0f}s"
    for line in reversed((r.stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), ""
            except json.JSONDecodeError:
                break
    return None, (f"rc={r.returncode} no JSON line; stderr tail: "
                  + (r.stderr or "")[-400:])


def main() -> None:
    if "--measure" in sys.argv:
        # child mode: measure in-process; a crash here is the supervisor's
        # signal to retry, so let exceptions propagate as nonzero exit
        emit(run_bench())
        return

    total_wait = float(os.environ.get("MLVAE_BENCH_PROBE_SECS", "1800"))
    deadline = time.monotonic() + total_wait
    last_err = ""
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        try:
            ok, waited = probe_backend(max(60.0, remaining))
        except Exception as e:  # never let the probe kill the JSON line
            emit(error_payload("probe_failed", repr(e)))
            return
        if not ok:
            emit(error_payload(
                "tpu_unavailable",
                "backend probe (`jax.devices()`) failed for the whole wait "
                "window; axon tunnel outage (see docs/PERF.md); last "
                "measure error: " + last_err,
                probe_waited_s=round(waited, 1),
            ))
            return
        payload, err = measure_subprocess(timeout_s=1800)
        if payload is not None:
            payload["attempts"] = attempt
            emit(payload)
            return
        last_err = err
        if time.monotonic() >= deadline:
            emit(error_payload(
                "bench_failed",
                f"measurement failed {attempt}x until the deadline; "
                f"last: {err}",
            ))
            return
        time.sleep(30.0)  # flap settle before re-probing


if __name__ == "__main__":
    main()
