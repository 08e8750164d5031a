#!/usr/bin/env python
"""Train the REFERENCE's own torch MD_VAE end-to-end on our synthetic corpus.

Measurement tool (nothing here ships in mlvae_tpu): answers "which
self-training pole does the reference's own code land on, on the same
corpus?" — the ground truth for whether the flagship's pole behavior in
our framework (docs/RESULTS.md base-rate caveat) is reference-faithful.

Reference surface reproduced here, with file:line citations:
- modules: imported directly from /root/reference/src/modules (via the
  speechbrain stub of tools/bench_torch_ref.py)
- 3-way target cycling incl. VALID using the cycled target and MD
  evaluation only on VAE epochs (MD_VAE/model.py:33-45, to_run_evaluation
  :228-229)
- per-target branch gating + detach of non-target losses
  (MD_VAE/model.py:76-102)
- in-forward joblib Viterbi decode for pi self-training labels
  (MD_VAE/model.py:133-150, decode_utils.py:546-551) and the second decode
  in compute_objectives during evaluation (model.py:187-218)
- loss weighting incl. KLD annealing n_samples=2249 (md_model.py:189-213)
- sb.Brain fit_batch semantics: backward, finite check, grad-norm clip
  5.0, single Adam(lr=1e-3) (md_model.py:54-88, MD_VAE/model.yaml:126-128)
- speechbrain InputNormalization norm_type=global with stats frozen from
  epoch 3 (MD_VAE/model.yaml:6-7) — transliterated from our parity port
  (mlvae_tpu/nn/norm.py)
- scoring with the reference's OWN MDMetricStats/BoundaryMetricStats
  (utils/metric_stats/*.py), best-plvl-F1 selection (model.yaml:172)

Usage:
    python tools/ref_corpus_train.py --data <datasets/SynAudioMNIST> \
        [--epochs 30] [--seed 123456] [--out ref_torch_run.json]
"""
from __future__ import annotations

import argparse
import copy
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import bench_torch_ref as hb  # noqa: E402  (installs path + constants)

hb.install_speechbrain_stub()
sys.path.insert(0, hb.REF)

N_PHONEMES = 12
N_CLASSES = N_PHONEMES + 2
INPUT_SIZE = 120
BATCH = 8                     # config/run.yaml:47
LR = 1e-3                     # MD_VAE/model.yaml:126-128
MAX_GRAD_NORM = 5.0           # sb.Brain default, md_model.py:78-86
KLD_N_SAMPLES = 2249          # md_model.py:199
LOSS_WEIGHTS = hb.LOSS_WEIGHTS
TARGETS = ["PHN_RECOG", "B_DETECTOR", "VAE"]  # MD_VAE/model.py:38


# ---------------------------------------------------------------------------
# data: computed-dataset pickles -> reference-style padded batches
# ---------------------------------------------------------------------------
def load_batches(data_dir: Path, split: str):
    """Duration-sorted consecutive batches of 8 with SpeechBrain
    PaddedBatch semantics: zero-pad to batch max, relative lengths
    (reference data_io.py:155-158 sorts and disables shuffle)."""
    with open(data_dir / "computed_dataset" / f"{split}.pkl", "rb") as f:
        data = pickle.load(f)
    items = sorted(data.items(), key=lambda kv: kv[1]["duration"])
    batches = []
    for i in range(0, len(items), BATCH):
        chunk = items[i:i + BATCH]
        ids = [k for k, _ in chunk]

        def pad(key, dtype):
            seqs = [np.asarray(s[key]) for _, s in chunk]
            L = max(len(x) for x in seqs)
            out = np.zeros((len(seqs),) + (L,) + seqs[0].shape[1:],
                           dtype=dtype)
            lens = np.zeros((len(seqs),), np.float32)
            for j, x in enumerate(seqs):
                out[j, :len(x)] = x
                lens[j] = len(x) / L
            return (torch.from_numpy(out), torch.from_numpy(lens))

        batch = {
            "id": ids,
            "feat": pad("feat", np.float32),
            "gt_cnncl_seq": pad("gt_cnncl_seq", np.int64),
            "fa_boundary_seq": pad("fa_boundary_seq", np.float32),
            "gt_boundary_seq": pad("gt_boundary_seq", np.float32),
            "plvl_gt_md_lbl_seq": pad("plvl_gt_md_lbl_seq", np.int64),
            "prior": (torch.from_numpy(
                np.stack([np.asarray(s["prior"]) for _, s in chunk])),
                torch.ones(len(chunk))),
        }
        batches.append(batch)
    return batches


# ---------------------------------------------------------------------------
# speechbrain InputNormalization (global), torch transliteration of the
# parity port mlvae_tpu/nn/norm.py (stats frozen from update_until_epoch=3)
# ---------------------------------------------------------------------------
class GlobalNormalizer:
    def __init__(self, update_until_epoch: int = 3):
        self.count = 0.0
        self.glob_mean = torch.zeros(INPUT_SIZE)
        self.glob_std = torch.ones(INPUT_SIZE)
        self.update_until_epoch = update_until_epoch

    def __call__(self, feats, feat_lens, epoch, update):
        eps = 1e-10
        B, T, C = feats.shape
        mask = (torch.arange(T)[None, :]
                < torch.round(feat_lens * T)[:, None]).float()[..., None]
        denom = mask.sum(dim=1).clamp(min=1.0)
        cur_mean = (feats * mask).sum(dim=1) / denom
        var = ((feats - cur_mean[:, None, :]) ** 2 * mask).sum(dim=1) / denom
        cur_std = var.clamp(min=eps).sqrt()
        if update and epoch < self.update_until_epoch:
            new_count = self.count + B
            w_old = self.count / new_count
            self.glob_mean = (w_old * self.glob_mean
                              + (1 - w_old) * cur_mean.mean(dim=0))
            self.glob_std = (w_old * self.glob_std
                             + (1 - w_old) * cur_std.mean(dim=0))
            self.count = new_count
        return (feats - self.glob_mean) / self.glob_std.clamp(min=eps)


# ---------------------------------------------------------------------------
# reference compute_forward with target gating (MD_VAE/model.py:61-160)
# ---------------------------------------------------------------------------
def compute_forward(modules, normalizer, batch, target, epoch, decode_fn,
                    training: bool):
    from torch.distributions import Categorical
    from torch.nn.utils.rnn import pad_sequence

    feats, feat_lens = batch["feat"]
    predictions = {"losses": {}}
    feats = normalizer(feats, feat_lens, epoch, update=training)

    phn_out = None
    if target in ("PHN_RECOG", "VAE", "TEST"):
        cnncl, cnncl_lens = batch["gt_cnncl_seq"]
        fa_boundary = batch["fa_boundary_seq"][0]
        phn_out = modules["phoneme_recognizer"](
            feats, feat_lens, cnncl, cnncl_lens, fa_boundary)
        predictions["phn_recog_out"] = phn_out["out"]
        losses = phn_out["losses"]
        if target != "PHN_RECOG":
            losses = {k: v.detach() for k, v in losses.items()}
        predictions["losses"].update(losses)

    if target in ("B_DETECTOR", "VAE", "TEST"):
        fa_boundary = batch["fa_boundary_seq"][0]
        b_out = modules["boundary_detector"](feats, feat_lens, fa_boundary)
        predictions["boundary_v"] = b_out["boundary_v"]
        losses = b_out["losses"]
        if target != "B_DETECTOR":
            losses = {k: v.detach() for k, v in losses.items()}
        predictions["losses"].update(losses)

    if target in ("VAE", "TEST"):
        feat_fc_out = modules["feat_fc"](feats)
        phn_recog_fc_out = modules["phn_recog_fc"](phn_out["out"].detach())
        rnn_in = torch.cat([feat_fc_out, phn_recog_fc_out], dim=-1)
        rnn_in = modules["concat_fc"](rnn_in)
        rnn_out = modules["rnn"](rnn_in)[0]
        pi_logits = modules["pi_fc"](rnn_out)
        predictions["pi_logits"] = pi_logits

        dist = Categorical(logits=pi_logits)
        if training:
            sampled_pi = dist.sample().float()   # model.py:124-126
        else:
            sampled_pi = torch.argmax(pi_logits, dim=-1).float()
        sampled_pi = torch.stack([1 - sampled_pi, sampled_pi], dim=2)
        predictions["sampled_pi"] = sampled_pi

        cnncl, cnncl_lens = batch["gt_cnncl_seq"]
        (dec_boundary, dec_flvl, dec_plvl) = decode_fn(
            predictions, utt_ids=batch["id"], feat_lens=feat_lens,
            plvl_cnnl_seqs=cnncl, plvl_cnnl_seq_lens=cnncl_lens,
            prior=batch["prior"][0][0], weight=1.0)
        predictions["decoded_boundary_seq"] = dec_boundary
        predictions["decoded_plvl_md_lbl_seq"] = dec_plvl
        flvl = [torch.tensor(np.asarray(s)).float() for s in dec_flvl]
        flvl = pad_sequence(flvl, batch_first=True)
        predictions["losses"]["pi_nll_loss"] = -dist.log_prob(flvl)

        enc_out = modules["encoder"](rnn_out, sampled_pi)
        predictions["losses"].update(enc_out["losses"])
        dec_out = modules["decoder"](enc_out["sampled_h"], feats)
        predictions["losses"].update(dec_out["losses"])
    return predictions


def total_loss(predictions, feat_lens):
    from utils.data_utils import apply_lens_to_loss
    loss = 0
    for key, el in predictions["losses"].items():
        w = LOSS_WEIGHTS[key]
        if "_kld" in key:
            w = w / (KLD_N_SAMPLES / BATCH)
        loss = loss + w * apply_lens_to_loss(el, feat_lens)
    return loss


def evaluate(modules, normalizer, batches, epoch, decode_fn, target="TEST"):
    """Reference evaluation: argmax pi, decode in compute_objectives, score
    with the reference's own metric stats (MD_VAE/model.py:187-218)."""
    from utils.metric_stats.md_metric_stats import MDMetricStats
    from utils.metric_stats.boundary_metric_stats import BoundaryMetricStats
    from utils.data_utils import undo_padding_tensor

    md_stats, b_stats = MDMetricStats(), BoundaryMetricStats()
    losses = []
    modules.eval()
    with torch.no_grad():
        for batch in batches:
            preds = compute_forward(modules, normalizer, batch, target,
                                    epoch, decode_fn, training=False)
            losses.append(float(total_loss(preds, batch["feat"][1])))
            gt_md = undo_padding_tensor(*batch["plvl_gt_md_lbl_seq"])
            gt_b = undo_padding_tensor(*batch["gt_boundary_seq"])
            # copy ids: the reference's MDMetricStats.append aliases the
            # caller's list into saved_seqs['utt_ids'] and then .extend()s
            # it IN PLACE on later appends (md_metric_stats.py:24-29) — a
            # reference bug masked there by transient DataLoader batches;
            # this harness reuses batch dicts across epochs (our port
            # defends with list(ids), mlvae_tpu/metrics/md.py:194)
            md_stats.append(
                ids=list(batch["id"]),
                pred_md_lbl_seqs=preds["decoded_plvl_md_lbl_seq"],
                gt_md_lbl_seqs=gt_md,
                pred_boundary_seqs=preds["decoded_boundary_seq"],
                gt_boundary_seqs=gt_b)
            b_stats.append(ids=list(batch["id"]),
                           predictions=preds["decoded_boundary_seq"],
                           targets=gt_b)
    modules.train()
    out = {"loss": float(np.mean(losses))}
    for k, v in md_stats.summarize().items():
        out[f"plvl_md.{k}"] = float(v)
    for k, v in b_stats.summarize().items():
        out[f"boundary.{k}"] = float(v)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=123456)
    ap.add_argument("--out", default="ref_torch_run.json")
    ap.add_argument("--dropout", type=float, default=0.15)  # run.yaml:76
    args = ap.parse_args()

    torch.manual_seed(args.seed)  # config/run.yaml:2-3
    torch.use_deterministic_algorithms(True, warn_only=True)  # train.py:7
    torch.set_num_threads(1)  # this build host exposes ONE core

    # identical outputs to the shipped joblib version (decode_utils.py:374);
    # on a 1-core host the per-call 8-way loky pool thrashes (observed: 550
    # leaked worker processes, load 500+), so use the reference's own serial
    # twin (decode_utils.py:191)
    from utils.decode_utils import (
        decode_plvl_md_lbl_seqs_full_non_par as decode_fn)

    data_dir = Path(args.data)
    train_b = load_batches(data_dir, "train")
    valid_b = load_batches(data_dir, "valid")
    test_b = load_batches(data_dir, "test")

    modules = hb.build_reference_model(dropout=args.dropout)
    # the harness builder pins init to seed 0; re-init under the requested
    # seed so multi-seed runs vary init AND sampling (yaml seeds before
    # module construction, config/run.yaml:2-3)
    torch.manual_seed(args.seed)
    for m in modules.modules():
        if hasattr(m, "reset_parameters"):
            m.reset_parameters()
    normalizer = GlobalNormalizer()
    opt = torch.optim.Adam(modules.parameters(), lr=LR)

    best = {"F1": -1.0, "epoch": 0, "state": None, "norm": None}
    rows = []
    for epoch in range(1, args.epochs + 1):
        target = TARGETS[(epoch - 1) % 3]
        t0 = time.time()
        tr_losses = []
        modules.train()
        for batch in train_b:
            preds = compute_forward(modules, normalizer, batch, target,
                                    epoch, decode_fn, training=True)
            loss = total_loss(preds, batch["feat"][1])
            opt.zero_grad()
            loss.backward()
            if torch.isfinite(loss):   # md_model.py:78-86 check_gradients
                torch.nn.utils.clip_grad_norm_(modules.parameters(),
                                               MAX_GRAD_NORM)
                opt.step()
            tr_losses.append(float(loss.detach()))
        row = {"epoch": epoch, "target": target,
               "train_loss": float(np.mean(tr_losses)),
               "train_s": round(time.time() - t0, 1)}
        # VALID: cycled target; MD evaluation only on VAE epochs
        # (to_run_evaluation, model.py:228-229)
        if target == "VAE":
            val = evaluate(modules, normalizer, valid_b, epoch, decode_fn,
                           target="VAE")
            row.update({f"valid.{k}": v for k, v in val.items()})
            f1 = val.get("plvl_md.F1", 0.0)
            if f1 > best["F1"]:
                best = {"F1": f1, "epoch": epoch,
                        "state": copy.deepcopy(modules.state_dict()),
                        "norm": copy.deepcopy(normalizer)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    if best["state"] is not None:
        modules.load_state_dict(best["state"])
        normalizer = best["norm"]
    test = evaluate(modules, normalizer, test_b, best["epoch"] or args.epochs,
                    decode_fn, target="TEST")
    result = {"seed": args.seed, "epochs": args.epochs,
              "best_valid_F1": best["F1"], "best_epoch": best["epoch"],
              "test": test, "rows": rows}
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(json.dumps({"TEST": test, "best_epoch": best["epoch"],
                      "best_valid_F1": best["F1"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
