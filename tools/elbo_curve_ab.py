"""Seeded multi-step ELBO training-trajectory A/B vs the reference's OWN code.

Closes the last unproven north-star gate (BASELINE.json: "ELBO curves
matching within tolerance").  The one-step value+gradient check
(``tests/test_elbo_parity.py``) compares against a torch replica built
inside the test; THIS harness trains the reference's own modules —
``/root/reference/src/modules/*`` imported directly, the loss math of
``md_model.py:189-213`` + ``MD_VAE/model.py:61-176`` reproduced via
``tools/bench_torch_ref.py`` — for N steps next to our PRODUCTION fused
train step (``mlvae_tpu.training.brain.Brain._make_train_step`` driving the
real ``models.MD_VAE.SBModel``), from identical init parameters on
identical batches, and asserts the per-step total-loss and per-key loss
trajectories match.

Determinization (applied symmetrically to BOTH frameworks):

* VAE reparameterization: latent = posterior mean (eps = 0)
  (ref ``vanilla_vae.py:37-40``)
* Gumbel-softmax: zero Gumbel noise -> hard straight-through on
  softmax(logits/tau) (ref ``gmm_vae.py:31``)
* Kumaraswamy boundary sampling: the SAME pre-drawn uniform noise U of
  shape (10, B, T) feeds both the reference's 10-draw loop
  (``boundary_detector.py:59-67``) and our batched draw
* pi: argmax instead of Categorical sampling (the reference's own EVAL
  branch, ``MD_VAE/model.py:126``)
* dropout = 0 everywhere

Everything else is the production path on both sides: the reference's
joblib Viterbi decode inside its forward vs our on-device lax.scan decode,
single Adam(lr=1e-3) (``MD_VAE/model.yaml:126-128``), grad-norm clip at 5.0
(sb.Brain ``check_gradients``; our Brain default), KLD annealing by
n_samples=2249 (``md_model.py:199``), masked per-key reductions
(``data_utils.py:67-104``).

This is a MEASUREMENT TOOL: it imports reference code to A/B against it;
nothing here ships in the mlvae_tpu framework.

Usage:
    python tools/elbo_curve_ab.py [--steps 60] [--write-docs]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO))

import bench_torch_ref as ref_harness  # noqa: E402

LR = 1e-3          # MD_VAE/model.yaml:126
MAX_GRAD_NORM = 5.0  # sb.Brain run_opts default, applied in check_gradients
M_KUMARASWAMY = 10   # boundary_detector sample_times


# ---------------------------------------------------------------------------
# shared deterministic noise
# ---------------------------------------------------------------------------

def draw_kumaraswamy_u(B, T, seed=1234):
    return np.random.RandomState(seed).random_sample(
        (M_KUMARASWAMY, B, T)).astype(np.float32)


# ---------------------------------------------------------------------------
# torch side: the reference's own modules + loss math
# ---------------------------------------------------------------------------

def _patch_torch_deterministic(U):
    import torch
    import torch.nn.functional as F

    state = {"i": 0}

    def rand_like_fixed(t, **kw):
        u = torch.from_numpy(U[state["i"] % M_KUMARASWAMY]).to(t.dtype)
        state["i"] += 1
        assert u.shape == t.shape, (u.shape, t.shape)
        return u

    def randn_like_zero(t, **kw):
        return torch.zeros_like(t)

    def det_gumbel(logits, tau=1.0, hard=False, **kw):
        y_soft = torch.softmax(logits / tau, dim=-1)
        if not hard:
            return y_soft
        idx = y_soft.argmax(dim=-1)
        y_hard = F.one_hot(idx, logits.shape[-1]).to(logits.dtype)
        return y_hard - y_soft.detach() + y_soft

    orig = (torch.rand_like, torch.randn_like, F.gumbel_softmax)
    torch.rand_like = rand_like_fixed
    torch.randn_like = randn_like_zero
    F.gumbel_softmax = det_gumbel

    def restore():
        torch.rand_like, torch.randn_like, F.gumbel_softmax = orig

    return state, restore


def torch_trajectory(steps, batch, U, flvl_checkpoints, init_sd=None,
                     perturb_eps=0.0):
    import torch

    ref_harness.install_speechbrain_stub()
    if ref_harness.REF not in sys.path:
        sys.path.insert(0, ref_harness.REF)
    from utils.decode_utils import decode_plvl_md_lbl_seqs_full
    from utils.data_utils import apply_lens_to_loss

    modules = ref_harness.build_reference_model(dropout=0.0)
    if init_sd is not None:
        modules.load_state_dict(init_sd)
    if perturb_eps:
        # noise-floor arm: relative O(eps) init perturbation, the size of a
        # single f32 rounding difference between two implementations.  The
        # spread between this arm and the unperturbed torch run bounds from
        # below how far ANY bit-different implementation drifts.
        g = torch.Generator().manual_seed(7)
        with torch.no_grad():
            for p in modules.parameters():
                p.add_(perturb_eps * p.abs()
                       * torch.randn(p.shape, generator=g))
    init_sd = {k: v.detach().clone() for k, v in modules.state_dict().items()}
    modules.train()

    u_state, restore = _patch_torch_deterministic(U)
    optimizer = torch.optim.Adam(modules.parameters(), lr=LR)
    feat_lens = batch[1]

    flvl_log = {}

    def recording_decode(predictions, **kw):
        out = decode_plvl_md_lbl_seqs_full(predictions, **kw)
        flvl_log["last"] = [np.asarray(s) for s in out[1]]
        return out

    rows = []
    try:
        for step in range(steps):
            u_state["i"] = 0  # same 10 Kumaraswamy draws every step
            predictions = ref_harness.compute_forward(
                modules, batch, recording_decode, det_pi=True)
            per_key = {k: float(apply_lens_to_loss(v, feat_lens).detach())
                       for k, v in predictions["losses"].items()}
            loss = ref_harness.compute_objectives(predictions, feat_lens)
            loss.backward()
            # sb.Brain.check_gradients: clip global grad norm at
            # max_grad_norm
            torch.nn.utils.clip_grad_norm_(modules.parameters(),
                                           MAX_GRAD_NORM)
            optimizer.step()
            optimizer.zero_grad()
            row = {"total": float(loss.detach()), "losses": per_key}
            if step in flvl_checkpoints:
                row["flvl"] = [s.tolist() for s in flvl_log["last"]]
            rows.append(row)
    finally:
        restore()
    return init_sd, rows


# ---------------------------------------------------------------------------
# torch state_dict -> mlvae_tpu param pytree
# ---------------------------------------------------------------------------

def _np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def conv_linear(tl):
    return {"weight": _np(tl.weight), "bias": _np(tl.bias)}


def conv_fcblock(tm):
    """Reference FCBlock (or Sequential wrapping one): Linears in
    registration order map to our ``lin{i}`` children."""
    import torch
    linears = [m for m in tm.modules() if isinstance(m, torch.nn.Linear)]
    return {f"lin{i}": conv_linear(l) for i, l in enumerate(linears)}


def conv_lstm(tl):
    return {k: _np(v) for k, v in tl.state_dict().items()}


def convert_params(modules_t):
    enc = modules_t["encoder"]
    dec = modules_t["decoder"]

    def conv_vanilla(v):
        return {"fc": conv_fcblock(v.fc), "mean_fc": conv_linear(v.mean_fc),
                "log_var_fc": conv_linear(v.log_var_fc)}

    def conv_gmm(g):
        return {
            "fc": conv_fcblock(g.fc),
            "prior_mean_fc": conv_linear(g.prior_mean_fc),
            "prior_log_var_fc": conv_linear(g.prior_log_var_fc),
            "mean_fc": conv_linear(g.mean_fc),
            "log_var_fc": conv_linear(g.log_var_fc),
            "gmm_weight_fc": conv_linear(g.gmm_weight_fc),
        }

    pr = modules_t["phoneme_recognizer"]
    bd = modules_t["boundary_detector"]
    return {
        "feat_fc": conv_fcblock(modules_t["feat_fc"]),
        "phoneme_recognizer": {"rnn": conv_lstm(pr.rnn),
                               "fc": conv_fcblock(pr.fc)},
        "phn_recog_fc": conv_fcblock(modules_t["phn_recog_fc"]),
        "boundary_detector": {"rnn": conv_lstm(bd.rnn),
                              "fc_alpha": conv_fcblock(bd.fc_alpha),
                              "fc_beta": conv_fcblock(bd.fc_beta)},
        "concat_fc": conv_fcblock(modules_t["concat_fc"]),
        "rnn": conv_lstm(modules_t["rnn"]),
        "pi_fc": conv_fcblock(modules_t["pi_fc"]),
        "encoder": {"vanilla_vae": conv_vanilla(enc.vanilla_vae),
                    "gmm_vae": conv_gmm(enc.gmm_vae)},
        "decoder": {"rnn": conv_lstm(dec.rnn),
                    "mean_fc": conv_fcblock(dec.mean_fc),
                    "log_var_fc": conv_fcblock(dec.log_var_fc)},
    }


# ---------------------------------------------------------------------------
# jax side: the production SBModel + fused train step
# ---------------------------------------------------------------------------

class IdentityNormalizer:
    """The A/B feeds pre-normalized synthetic features on both sides (the
    torch harness has no speechbrain InputNormalization), so the recipe's
    normalizer slot is identity here."""

    def apply(self, state, feats, feat_lens, epoch=None, update=False):
        return feats, state


def _patch_jax_deterministic(U):
    import jax
    import jax.numpy as jnp
    import mlvae_tpu.nn.dist as D

    U_j = jnp.asarray(U)

    def reparameterize(rng, mean, log_var):
        return mean

    def gumbel_softmax(rng, logits, tau=1.0, hard=False):
        in_dtype = logits.dtype
        logits = jnp.asarray(logits, jnp.float32)
        y_soft = jax.nn.softmax(logits / tau, axis=-1)
        if not hard:
            return y_soft.astype(in_dtype)
        idx = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
        return (y_hard + y_soft - jax.lax.stop_gradient(y_soft)).astype(
            in_dtype)

    def kumaraswamy_sample(rng, alpha, beta, u_lo=0.01, u_span=0.98,
                           eps=1e-5):
        alpha = jnp.asarray(alpha, jnp.float32)
        beta = jnp.asarray(beta, jnp.float32)
        assert U_j.shape == alpha.shape, (U_j.shape, alpha.shape)
        u = U_j * u_span + u_lo
        v = jnp.power(1.0 - jnp.power(u, 1.0 / beta), 1.0 / alpha)
        return v * (1.0 - 2.0 * eps) + eps

    def categorical_sample(rng, logits):
        return jnp.argmax(logits, axis=-1)

    orig = (D.reparameterize, D.gumbel_softmax, D.kumaraswamy_sample,
            D.categorical_sample)
    D.reparameterize = reparameterize
    D.gumbel_softmax = gumbel_softmax
    D.kumaraswamy_sample = kumaraswamy_sample
    D.categorical_sample = categorical_sample

    def restore():
        (D.reparameterize, D.gumbel_softmax, D.kumaraswamy_sample,
         D.categorical_sample) = orig

    return restore


def build_jax_model(B):
    from mlvae_tpu.modules.fc_block import FCBlock
    from mlvae_tpu.modules.phoneme_recognizer import PhonemeRecognizer
    from mlvae_tpu.modules.boundary_detector import BoundaryDetector
    from mlvae_tpu.modules.h_vae import HierarchicalVAE
    from mlvae_tpu.modules.decoder import Decoder
    from mlvae_tpu.nn.rnn import LSTM
    from mlvae_tpu.models.MD_VAE.model import SBModel
    from mlvae_tpu.training.optim import Adam

    I = ref_harness.INPUT_SIZE
    NC = ref_harness.N_CLASSES
    modules = {
        "feat_fc": FCBlock([I, 64, 64], end_activation=True),
        "phoneme_recognizer": PhonemeRecognizer(
            I, 512, 2, [512, 128, 128, NC], ref_harness.N_PHONEMES),
        "phn_recog_fc": FCBlock([NC, 32, 32], end_activation=True),
        "boundary_detector": BoundaryDetector(I, 512, 2, [512, 128, 128, 1]),
        "concat_fc": FCBlock([64 + 32, 128, 128], end_activation=True),
        "rnn": LSTM(128, 512, 2, batch_first=True, dropout=0.0),
        "pi_fc": FCBlock([512, 128, 64, 2]),
        "encoder": HierarchicalVAE([512, 64, 64], 32, 3),
        "decoder": Decoder(32, 512, 2, 0.0, [1024, 64, 64, I]),
    }
    hparams = {
        "normalizer": IdentityNormalizer(),
        "optimizer": Adam(lr=LR),
        "batch_size": B,
        # MD_VAE/model.yaml:157-159 (+ implicit 1.0 defaults), matching
        # ref_harness.LOSS_WEIGHTS
        "phn_recog_bce_weight": 1.0,
        "boundary_bce_weight": 1.0,
        "boundary_kld_weight": 1e-5,
        "pi_nll_weight": 1e-3,
        "vae_kld_weight": 1e-5,
        "recon_weight": 1.0,
        "kld_n_samples": ref_harness.KLD_N_SAMPLES,
        "dec_weight": 1.0,
        "metric_keys": [],
    }
    return SBModel(modules=modules, hparams=hparams,
                   run_opts={"max_grad_norm": MAX_GRAD_NORM})


def jax_trajectory(steps, batch_np, params, U, flvl_checkpoints):
    import jax
    import jax.numpy as jnp
    from mlvae_tpu.training.brain import Stage

    restore = _patch_jax_deterministic(U)

    feats, feat_lens, cnncl, cnncl_lens, boundary, prior = batch_np
    B = feats.shape[0]
    batch = {
        "feat": (jnp.asarray(feats), jnp.asarray(feat_lens)),
        "gt_cnncl_seq": (jnp.asarray(cnncl, np.int32),
                         jnp.asarray(cnncl_lens)),
        "fa_boundary_seq": (jnp.asarray(boundary), jnp.asarray(feat_lens)),
        "prior": (jnp.asarray(np.tile(prior[None, :], (B, 1))),
                  jnp.ones(B, np.float32)),
    }

    model = build_jax_model(B)
    model.on_stage_start(Stage.TRAIN, epoch=3)  # (3-1)%3 -> Target.VAE
    model.params = jax.tree_util.tree_map(jnp.asarray, params)
    model.states = {"normalizer": jnp.zeros(())}
    model.init_optimizers()
    step_fn = model._make_train_step()

    epoch = jnp.asarray(3, jnp.int32)
    rng = jax.random.PRNGKey(0)  # unused: all sampling is determinized
    rows = []
    try:
        for step in range(steps):
            if step in flvl_checkpoints:
                preds, _ = model.compute_forward(
                    model.params, model.states, batch, Stage.TRAIN, rng,
                    epoch)
                flvl = np.asarray(preds["decoded_flvl_md_lbl_seq"])
                t_lens = np.asarray(preds["decoded_t_lens"])
                flvl_row = [flvl[i, :t_lens[i]].tolist() for i in range(B)]
            else:
                flvl_row = None
            (model.params, model.opt_states, model.states, loss, losses) = \
                step_fn(model.params, model.opt_states, model.states, rng,
                        batch, epoch)
            row = {"total": float(loss),
                   "losses": {k: float(v) for k, v in losses.items()}}
            if flvl_row is not None:
                row["flvl"] = flvl_row
            rows.append(row)
    finally:
        restore()
    return rows


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

def compare(torch_rows, jax_rows):
    n = len(torch_rows)
    keys = sorted(torch_rows[0]["losses"])
    diffs = {"total": [], **{k: [] for k in keys}}
    for t_row, j_row in zip(torch_rows, jax_rows):
        assert sorted(j_row["losses"]) == keys, (keys, sorted(j_row["losses"]))
        for name, tv, jv in (
            [("total", t_row["total"], j_row["total"])]
            + [(k, t_row["losses"][k], j_row["losses"][k]) for k in keys]
        ):
            rel = abs(jv - tv) / max(abs(tv), 1e-8)
            diffs[name].append(rel)

    flvl_match = {}
    for i, (t_row, j_row) in enumerate(zip(torch_rows, jax_rows)):
        if "flvl" in t_row:
            assert "flvl" in j_row, f"step {i}: jax flvl checkpoint missing"
            flvl_match[i] = all(
                ts == js for ts, js in zip(t_row["flvl"], j_row["flvl"]))

    return {
        "steps": n,
        "max_rel": {k: max(v) for k, v in diffs.items()},
        "final_rel": {k: v[-1] for k, v in diffs.items()},
        "per_step_rel_total": diffs["total"],
        "decoded_flvl_labels_identical": flvl_match,
    }


def run_ab(steps=60, flvl_every=20, noise_floor=False):
    import torch

    torch.manual_seed(0)
    batch_t = ref_harness.synth_batch()
    batch_np = tuple(np.asarray(b) for b in batch_t)
    B, T = batch_np[0].shape[:2]
    U = draw_kumaraswamy_u(B, T)
    flvl_checkpoints = set(range(0, steps, flvl_every)) | {steps - 1}

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")

    torch_init, torch_rows = torch_trajectory(steps, batch_t, U,
                                              flvl_checkpoints)
    modules_t = ref_harness.build_reference_model(dropout=0.0)
    modules_t.load_state_dict(torch_init)
    params = convert_params(modules_t)

    jax_rows = jax_trajectory(steps, batch_np, params, U, flvl_checkpoints)
    report = compare(torch_rows, jax_rows)

    if noise_floor:
        # torch-vs-torch with an O(1e-6) init perturbation: the chaos floor
        # any bit-different implementation of the same math drifts by
        _, pert_rows = torch_trajectory(steps, batch_t, U, flvl_checkpoints,
                                        init_sd=torch_init,
                                        perturb_eps=1e-6)
        floor = compare(torch_rows, pert_rows)
        report["noise_floor_max_rel"] = floor["max_rel"]
        report["noise_floor_final_rel"] = floor["final_rel"]
    report["config"] = {
        "B": B, "T": T, "L": ref_harness.L, "steps": steps, "lr": LR,
        "max_grad_norm": MAX_GRAD_NORM,
        "backend": jax.default_backend(),
        "torch_curve_total": [r["total"] for r in torch_rows],
        "jax_curve_total": [r["total"] for r in jax_rows],
        "torch_curve_per_key": {
            k: [r["losses"][k] for r in torch_rows]
            for k in torch_rows[0]["losses"]},
        "jax_curve_per_key": {
            k: [r["losses"][k] for r in jax_rows]
            for k in jax_rows[0]["losses"]},
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--tol", type=float, default=5e-3,
                    help="max per-step relative total-loss difference")
    ap.add_argument("--out", default=str(REPO / "docs/elbo_curve_ab.json"))
    ap.add_argument("--noise-floor", action="store_true",
                    help="add a torch-vs-perturbed-torch chaos-floor arm")
    args = ap.parse_args()

    report = run_ab(steps=args.steps, noise_floor=args.noise_floor)
    Path(args.out).write_text(json.dumps(report, indent=2) + "\n")

    keys = ["steps", "max_rel", "final_rel", "decoded_flvl_labels_identical"]
    if args.noise_floor:
        keys += ["noise_floor_max_rel", "noise_floor_final_rel"]
    print(json.dumps({k: report[k] for k in keys}, indent=2))
    ok = (report["max_rel"]["total"] < args.tol
          and all(report["decoded_flvl_labels_identical"].values()))
    print(f"ELBO curve A/B: {'PASS' if ok else 'FAIL'} "
          f"(max rel total {report['max_rel']['total']:.2e}, tol {args.tol})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
