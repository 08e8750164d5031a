"""HBM-roofline accounting for the fused MD_VAE training step.

VERDICT.md (round 1) asked for a checkable bytes-per-step accounting
against the v5e HBM bandwidth.  This tool provides two independent
estimates and, when a real TPU is reachable, compares them with the
measured step time:

1. **Analytic model** (always available): per-component HBM traffic
   computed from tensor shapes and the actual streaming behaviour of the
   Pallas LSTM kernels (``ops/lstm_pallas.py``): which arrays stream per
   time step, which stay VMEM-resident, which residuals the backward pass
   re-reads, and the dtypes of each stream (bf16 under AMP, f32 cell
   trajectories / optimizer state).

2. **XLA cost analysis** (TPU only): ``compiled.cost_analysis()`` bytes
   accessed for the non-Pallas portion of the step (Pallas custom calls
   are opaque to it, so the analytic kernel numbers are added on top).

Usage:  python tools/roofline.py [--measure]
        --measure also times the step (requires the TPU tunnel).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_HBM_GBPS = 819.0   # v5e: 16 GB HBM2 @ 819 GB/s
BF16 = 2
F32 = 4

B, T, L = 128, 160, 8
N_CLASSES = 14
INPUT = 120
E = B * T  # frame count per step


def mb(x):
    return x / 1e6


class Ledger:
    def __init__(self):
        self.rows = []

    def add(self, component, bytes_, note=""):
        self.rows.append((component, bytes_, note))

    def total(self):
        return sum(r[1] for r in self.rows)

    def table(self):
        out = ["| component | MB/step | notes |", "|---|---|---|"]
        for c, b, n in sorted(self.rows, key=lambda r: -r[1]):
            out.append(f"| {c} | {mb(b):.0f} | {n} |")
        out.append(f"| **total** | **{mb(self.total()):.0f}** | |")
        return "\n".join(out)


def lstm_dir_layer(led, name, In, H=512, stream=BF16, mode="auto"):
    """One DIRECTIONAL Pallas LSTM layer fwd+bwd (ops/lstm_pallas.py).

    ``mode`` models the nn/rnn dispatch, now default-on for bf16 streams
    (hardware-validated, docs/PERF.md):

    - "hoisted": recurrence-only kernel + XLA input projection.  Streams per
      time step: fwd gx read (stream) + hs/cs writes [x read + gx write by
      the XLA projection matmul]; bwd gx read, cs read x2 (c_prev + c_t
      views), hs read (h_prev), dhs read, dgx write [dgx read x2 + x read +
      dX write by the XLA dX/dW_ih matmuls].
    - "fused": input projection inside the kernel — the (T,B,4H) gates
      tensor never exists in HBM; x/dX stream instead and dW_ih/db
      accumulate in VMEM.
    - "semifused": fused forward; backward streams x, recomputes gates, and
      emits dgx for XLA's dX/dW_ih matmuls (the In=1024 decoder layers,
      whose fully-fused residents exceed the VMEM budget).
    - "auto": what the bf16 default dispatch picks for (In, H): fused when
      the backward residents fit, else semifused.

    W_hh / dW_hh stay VMEM-resident (negligible vs the streams).
    """
    In_pad = -(-In // 128) * 128
    if mode == "auto":
        from mlvae_tpu.ops.lstm_pallas import (fused_eligible,
                                               semifused_eligible)
        if fused_eligible(In_pad, H, "bfloat16" if stream == BF16
                          else "float32") and stream == BF16:
            mode = "fused"
        elif stream == BF16 and semifused_eligible(In_pad, H, "bfloat16"):
            mode = "semifused"
        else:
            mode = "hoisted"
    G = 4 * H
    gx = E * G * stream          # one touch of the (T,B,4H) pre-gates
    hs = E * H * stream
    cs = E * H * F32
    dhs = E * H * stream
    x = E * In_pad * stream      # fused paths stream the lane-padded x
    if mode == "fused":
        # fwd kernel: x read, hs+cs write; bwd kernel: x read, cs read x2,
        # hs read, dhs read, dX write (dW_ih/db accumulate in VMEM)
        total = (x + hs + cs) + (x + 2 * cs + hs + dhs + x)
    elif mode == "semifused":
        # fwd kernel: x read, hs+cs write; bwd kernel: x read, cs x2, hs,
        # dhs, dgx write; XLA: dgx read x2 (dX + dW_ih), x read, dX write
        total = ((x + hs + cs) + (x + 2 * cs + hs + dhs + gx)
                 + 2 * gx + x + x)
    else:
        x = E * In * stream      # hoisted path takes unpadded x
        total = (
            # fwd: XLA proj (x read, gx write) + kernel (gx read, hs+cs wr)
            x + gx + gx + hs + cs
            # bwd kernel: gx read, cs read x2, hs read, dhs read, dgx write
            + gx + 2 * cs + hs + dhs + gx
            # bwd XLA: dgx read (dX matmul), dgx read (dW_ih matmul),
            # x read (dW_ih), dX write
            + 2 * gx + x + x
        )
    led.add(f"lstm {name} (In={In}, {mode})", total,
            "Pallas recurrence + XLA projections" if mode == "hoisted"
            else f"{mode} Pallas kernel")
    return total


def fc_stack(led, name, sizes, stream=BF16, loss_extra=0):
    """FC chain fwd+bwd: XLA fuses matmul+bias+LeakyReLU, so per layer
    fwd = in read + out write; bwd = dout read + act read (saved) +
    din write + (dW: in read + dout read).  Weights negligible at these
    sizes."""
    total = 0
    for a, b_ in zip(sizes[:-1], sizes[1:]):
        fwd = E * (a + b_) * stream
        bwd = E * (3 * b_ + 2 * a) * stream
        total += fwd + bwd
    total += loss_extra
    led.add(f"fc {name} {sizes}", total)
    return total


def build_ledger():
    led = Ledger()
    # --- the ten directional LSTM layers (sizes: MD_VAE/model.yaml) ---
    lstm_dir_layer(led, "phn_recog L0", INPUT)
    lstm_dir_layer(led, "phn_recog L1", 512)
    lstm_dir_layer(led, "boundary L0", INPUT)
    lstm_dir_layer(led, "boundary L1", 512)
    lstm_dir_layer(led, "trunk L0", 128)
    lstm_dir_layer(led, "trunk L1", 512)
    lstm_dir_layer(led, "dec fwd L0", 32)
    lstm_dir_layer(led, "dec bwd L0", 32)
    lstm_dir_layer(led, "dec fwd L1", 1024)
    lstm_dir_layer(led, "dec bwd L1", 1024)

    # --- FC stacks ---
    fc_stack(led, "feat_fc", [INPUT, 64, 64])
    fc_stack(led, "phn_recog head", [512, 128, 128, N_CLASSES])
    fc_stack(led, "phn_recog_fc", [N_CLASSES, 32, 32])
    fc_stack(led, "boundary heads x2", [512, 128, 128, 1])
    fc_stack(led, "boundary heads x2b", [512, 128, 128, 1])
    fc_stack(led, "concat_fc", [64 + 32, 128, 128])
    fc_stack(led, "pi_fc", [512, 128, 64, 2])
    # encoder: vanilla [512,64,64]+2x32 heads, gmm [512,64,64]+4x96+3 heads
    fc_stack(led, "vae vanilla", [512, 64, 64, 32, 32])
    fc_stack(led, "vae gmm", [512, 64, 64, 96, 96, 96, 96, 3])
    # decoder heads read the (T,B,1024) bi-LSTM output twice
    fc_stack(led, "dec mean head", [1024, 64, 64, INPUT])
    fc_stack(led, "dec logvar head", [1024, 64, 64, INPUT])

    # --- elementwise loss fields (per-element losses kept at (B,T,C)) ---
    led.add("recon NLL field", 6 * E * INPUT * F32,
            "mean/logvar/target reads + loss field fwd+bwd (f32 loss math)")
    led.add("vae KLD field", 6 * E * 32 * F32)
    led.add("phn BCE field", 6 * E * N_CLASSES * F32)
    led.add("boundary Kumaraswamy x10", 10 * 4 * E * F32,
            "10 MC samples of (B,T) sample+BCE (f32)")

    # --- decode (on-device Viterbi, ops/decode.py) ---
    led.add("viterbi decode", E * L * 2 * F32 * 4 + E * N_CLASSES * F32 * 2,
            "(B,T,L,2) DP values+backtrace scan, one-hot emission matmul")

    # --- optimizer + params (f32 masters; Adam m/v) ---
    n_params = 0
    for In, H in [(INPUT, 512), (512, 512)] * 2 + [(128, 512), (512, 512)]:
        n_params += 4 * H * (In + H + 2)
    for In, H in [(32, 512), (512, 512), (1024, 512), (512, 512)]:
        n_params += 4 * H * (In + H + 2)  # decoder bidir: 2 dirs/layer
    n_params += 2 * 512 * 4 * (512 + 2)  # 2nd bidir dir pair approx
    fc_params = 0
    for sizes in ([INPUT, 64, 64], [512, 128, 128, N_CLASSES],
                  [N_CLASSES, 32, 32], [512, 128, 128, 1],
                  [512, 128, 128, 1], [96, 128, 128], [512, 128, 64, 2],
                  [512, 64, 64, 32, 32], [512, 64, 64, 96, 96, 96, 96, 3],
                  [1024, 64, 64, INPUT], [1024, 64, 64, INPUT]):
        for a, b_ in zip(sizes[:-1], sizes[1:]):
            fc_params += a * b_ + b_
    n_params += fc_params
    led.add("optimizer (Adam)", n_params * F32 * 9,
            f"~{n_params/1e6:.1f}M params x (p,g,m,v reads + p,m,v writes "
            "+ clip-norm read + bf16 cast write)")
    led.add("grad clip + nonfinite check", n_params * F32 * 2)
    return led, n_params


def tpu_measure():
    """Compile the real bench step on the TPU; return (xla_bytes, step_ms)."""
    import time
    import jax
    import jax.numpy as jnp
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage
    from mlvae_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
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
    args = (model.params, model.opt_states, model.states, rng, batch, epoch)
    lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_bytes = float(ca.get("bytes accessed", 0.0))
    flops = float(ca.get("flops", 0.0))
    # measure
    p, o, s = model.params, model.opt_states, model.states
    p, o, s, loss, _ = step(p, o, s, rng, batch, epoch)
    float(loss)
    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        p, o, s, loss, _ = step(p, o, s, jax.random.fold_in(rng, i), batch,
                                epoch)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    return xla_bytes, flops, dt * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="also compile+time on the real TPU")
    args = ap.parse_args()

    led, n_params = build_ledger()
    total = led.total()
    print(led.table())
    t_roof_ms = total / (V5E_HBM_GBPS * 1e9) * 1e3
    print(f"\nanalytic bytes/step: {total/1e9:.2f} GB  "
          f"-> HBM roofline floor at {V5E_HBM_GBPS:.0f} GB/s: "
          f"{t_roof_ms:.2f} ms/step")
    result = {
        "analytic_bytes_per_step": total,
        "roofline_floor_ms": round(t_roof_ms, 2),
        "n_params": n_params,
        "hbm_gbps": V5E_HBM_GBPS,
    }
    out = Path(__file__).resolve().parent.parent / "docs" / "roofline.json"
    if args.measure:
        xla_bytes, flops, step_ms = tpu_measure()
        frac = t_roof_ms / step_ms
        print(f"XLA cost_analysis bytes (non-Pallas): {xla_bytes/1e9:.2f} GB"
              f"  flops: {flops/1e12:.2f} TF")
        print(f"measured step: {step_ms:.2f} ms -> achieved "
              f"{total/ (step_ms/1e3) / 1e9:.0f} GB/s "
              f"= {frac*100:.0f}% of HBM roofline")
        result.update({
            "xla_bytes_accessed": xla_bytes,
            "xla_flops": flops,
            "measured_step_ms": round(step_ms, 2),
            "roofline_fraction": round(frac, 3),
        })
    elif out.exists():
        # A run without --measure must not drop the previously MEASURED
        # fields (they require the TPU tunnel to regenerate): carry them
        # over, refreshing only the analytic side.
        try:
            prev = json.loads(out.read_text())
        except json.JSONDecodeError:
            prev = {}
        for key in ("xla_bytes_accessed", "xla_flops", "measured_step_ms"):
            if key in prev:
                result[key] = prev[key]
        if "measured_step_ms" in result:
            # fraction re-derived against the REFRESHED analytic floor
            result["roofline_fraction"] = round(
                t_roof_ms / result["measured_step_ms"], 3)
    out.write_text(json.dumps(result, indent=2) + "\n")


if __name__ == "__main__":
    main()
