"""End-to-end slice (BASELINE.md gate config #1 + SURVEY §4 smoke test):
config load -> synthetic data prep -> features -> fused jitted VAE train
step -> checkpoint -> evaluate, through the real CLI entry points."""
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


from conftest import explicit_default_weights


def _train_args(n_epochs=2):
    model_yaml = REPO / "mlvae_tpu/models/test_vanilla_vae/model.yaml"
    return [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "tv_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: %d, %s}}" % (n_epochs, explicit_default_weights(model_yaml)),
        "--debug", "--debug_batches", "2",
    ]


def test_train_then_evaluate_smoke(workdir):
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli

    model = train_cli.main(_train_args())
    # epoch counter consumed both epochs
    assert model.hparams["epoch_counter"].current == 2
    # training logged and checkpointed
    out_dir = workdir / "results/tv_smoke"
    assert (out_dir / "train_log.txt").exists()
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert len(ckpts) >= 1

    # loss stats were recorded per metric key
    log_text = (out_dir / "train_log.txt").read_text()
    assert "kld_loss" in log_text and "recon_loss" in log_text

    # evaluate recalls the best checkpoint and writes TEST outputs
    model2 = test_cli.main(_train_args())
    test_metrics = out_dir / "test_output/test_metrics.txt"
    assert test_metrics.exists()
    text = test_metrics.read_text()
    assert "loss:" in text


def test_training_reduces_loss(workdir):
    """A slightly longer run must actually learn (loss decreases)."""
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli.experiment import prepare_experiment

    args = [a for a in _train_args(n_epochs=4)
            if a not in ("--debug",)]
    # drop the debug flag pair
    i = args.index("--debug_batches")
    args = args[:i] + args[i + 2:]
    model = train_cli.main(args)
    log = (workdir / "results/tv_smoke/train_log.txt").read_text().splitlines()
    train_lines = [l for l in log if "stage: train" in l]
    first = float(train_lines[0].split("loss: ")[1].split(",")[0])
    last = float(train_lines[-1].split("loss: ")[1].split(",")[0])
    assert last < first, (first, last)


def test_scan_epoch_with_async_ckpt(workdir):
    """The corpus quality-run configuration (--scan_epoch + --async_ckpt
    together): the epoch-in-jit fit must interleave with worker-thread
    checkpoint saves, flush at fit end, and recall the best checkpoint at
    evaluate time.  (Scan/loop numeric parity and async/sync checkpoint
    parity are each pinned by their own suites; this locks the combination
    through the real CLI.)"""
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli

    model_yaml = REPO / "mlvae_tpu/models/test_vanilla_vae/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "tv_scan_async",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: 3, %s}}" % explicit_default_weights(model_yaml),
        "--scan_epoch", "True",
        "--async_ckpt", "True",
        "--noprogressbar", "True",
    ]
    model = train_cli.main(args)
    assert model.hparams["epoch_counter"].current == 3
    out_dir = workdir / "results/tv_scan_async"
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert len(ckpts) >= 1  # async worker flushed before fit returned

    test_cli.main(args)
    assert (out_dir / "test_output/test_metrics.txt").exists()
