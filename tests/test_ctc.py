"""CTC ops: loss vs torch oracle, greedy decode, forced-alignment
segmentation invariants, and the CRDNN_CTC smoke run (the reference's
test.sh scenario)."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from mlvae_tpu.ops import ctc as ctc_ops

REPO = Path(__file__).resolve().parent.parent


def test_ctc_loss_matches_torch():
    rs = np.random.RandomState(0)
    B, T, K, L = 3, 20, 6, 5
    logits = rs.randn(B, T, K).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    targets = rs.randint(1, K, (B, L))
    in_abs = np.asarray([20, 16, 12])
    tgt_abs = np.asarray([5, 4, 2])

    theirs = torch.nn.functional.ctc_loss(
        log_probs.permute(1, 0, 2), torch.from_numpy(targets),
        torch.from_numpy(in_abs), torch.from_numpy(tgt_abs),
        blank=0, reduction="mean", zero_infinity=True,
    ).item()

    ours = float(ctc_ops.ctc_loss(
        jnp.asarray(np.asarray(log_probs)), jnp.asarray(targets),
        jnp.asarray(in_abs / T), jnp.asarray(tgt_abs / L), blank_index=0,
    ))
    assert abs(ours - theirs) / abs(theirs) < 1e-4, (ours, theirs)


def test_ctc_greedy_decode():
    # frames argmax to: [blank, a, a, blank, b] -> [a, b]
    K = 3
    probs = np.zeros((1, 5, K))
    for t, k in enumerate([0, 1, 1, 0, 2]):
        probs[0, t, k] = 1.0
    out = ctc_ops.ctc_greedy_decode(probs, np.asarray([1.0]), blank_id=0)
    assert out == [[1, 2]]


def test_forced_alignment_recovers_planted_segments():
    rs = np.random.RandomState(1)
    K, T = 5, 60
    labels = [2, 3, 2]
    # plant strong posteriors: segments of 20 frames per label
    logp = np.full((T, K), -8.0)
    for i, lab in enumerate(labels):
        logp[i * 20:(i + 1) * 20, lab] = -0.05
    starts = ctc_ops.ctc_forced_alignment(logp, labels, blank_id=0)
    assert list(starts) == sorted(list(starts))
    assert abs(starts[1] - 20) <= 2 and abs(starts[2] - 40) <= 2

    boundary = ctc_ops.ctc_segmentation_boundaries(logp, labels, blank_id=0)
    assert boundary.sum() == len(labels)
    assert boundary[0] == 1


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("ctc_wd")
    old = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(old)


@pytest.mark.parametrize("recipe", ["CRDNN_CTC", "CRDNN_CTC_cnncl"])
def test_crdnn_ctc_smoke(workdir, recipe):
    """The reference's smoke test (test.sh): 1 epoch CRDNN_CTC on
    SynAudioMNIST with debug batches."""
    from mlvae_tpu.cli import train as train_cli

    model_yaml = REPO / f"mlvae_tpu/models/{recipe}/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", recipe,
        "--model_name", f"{recipe}_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides", "{model: {n_epochs: 1}}",
        "--debug", "--debug_batches", "2",
    ]
    train_cli.main(args)
    log = (workdir / f"results/{recipe}_smoke/train_log.txt").read_text()
    assert "plvl_md.F1" in log
    assert "phn_per.error_rate" in log


def test_ctc_loss_zero_infinity_parity():
    """torch/speechbrain pass zero_infinity=True: an utterance whose input
    is too short for any CTC path (|y| + consecutive-repeat blanks > T_in)
    contributes 0 loss and 0 grad; optax would instead contribute a
    ~1e5-scale filler that blows up the batch mean (regression)."""
    import jax

    rs = np.random.RandomState(2)
    B, T, K, L = 2, 8, 5, 6
    logits = rs.randn(B, T, K).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
    # utt 0 feasible; utt 1 infeasible: 6 labels incl. a repeat pair -> needs
    # >= 7 frames but only gets 4
    targets = np.asarray([[1, 2, 3, 4, 1, 2],
                          [1, 1, 2, 3, 4, 2]])
    in_abs = np.asarray([8, 4])
    tgt_abs = np.asarray([6, 6])

    theirs = torch.nn.functional.ctc_loss(
        log_probs.permute(1, 0, 2), torch.from_numpy(targets),
        torch.from_numpy(in_abs), torch.from_numpy(tgt_abs),
        blank=0, reduction="mean", zero_infinity=True,
    ).item()

    def ours_fn(lp):
        return ctc_ops.ctc_loss(
            lp, jnp.asarray(targets), jnp.asarray(in_abs / T),
            jnp.asarray(tgt_abs / L), blank_index=0)

    lp = jnp.asarray(np.asarray(log_probs))
    ours = float(ours_fn(lp))
    assert abs(ours - theirs) / abs(theirs) < 1e-4, (ours, theirs)
    # gradient for the infeasible utterance is exactly zero
    g = np.asarray(jax.grad(lambda x: ours_fn(x))(lp))
    assert np.all(g[1] == 0)
    assert np.any(g[0] != 0)
