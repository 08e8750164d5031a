"""Remaining CLI surfaces: test_on_three_sets and the ingestion tool."""
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


from conftest import explicit_default_weights


def test_ingest_cli(tmp_path):
    from mlvae_tpu.cli.ingest import ingest
    from mlvae_tpu.data.wav import read_wav, write_wav

    src = tmp_path / "src" / "spk"
    src.mkdir(parents=True)
    t = np.arange(11025) / 22050.0
    write_wav(src / "a.wav", 0.3 * np.sin(2 * np.pi * 220 * t), 22050)
    n = ingest(tmp_path / "src", tmp_path / "dst", rate=16000)
    assert n == 1
    wave, sr = read_wav(tmp_path / "dst/spk/a.wav")
    assert sr == 16000
    assert abs(len(wave) - 8000) <= 8


def test_test_on_three_sets(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test_on_three_sets as three_cli

    model_yaml = REPO / "mlvae_tpu/models/test_vanilla_vae/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "three_sets",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: 1, %s}}" % explicit_default_weights(model_yaml),
        "--debug", "--debug_batches", "1",
    ]
    train_cli.main(args)
    model = three_cli.main(args)
    out = tmp_path / "results/three_sets/test_output/test_metrics.txt"
    assert out.exists()


def test_bool_run_opt_rejects_typos():
    from mlvae_tpu.cli.args import parse_arguments

    with pytest.raises(ValueError, match="expects a boolean"):
        parse_arguments(["config.yaml", "--debug", "ture"])
    _, run_opts, _ = parse_arguments(
        ["config.yaml", "--debug", "True", "--bf16", "off"])
    assert run_opts["debug"] is True and run_opts["bf16"] is False


def test_saved_hyperparams_record_overrides(tmp_path, monkeypatch):
    """The experiment dir must record the ACTUAL run config: the saved
    hyperparams.yaml has CLI overrides and extra_overrides applied
    (reference parity with sb.create_experiment_directory)."""
    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli

    REPO = Path(__file__).resolve().parent.parent
    model_yaml = REPO / "mlvae_tpu/models/test_vanilla_vae/model.yaml"
    train_cli.main([
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "ovr_record",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: 1, %s}}" % explicit_default_weights(model_yaml),
        "--debug", "--debug_batches", "1",
    ])
    text = (tmp_path / "results/ovr_record/hyperparams.yaml").read_text()
    assert "n_epochs: 1" in text
    assert "model_class: test_vanilla_vae" in text
