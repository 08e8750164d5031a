"""Single-utterance inference path over a trained MD_VAE checkpoint."""
from conftest import explicit_default_weights
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_infer_single_wav(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import infer as infer_cli

    model_yaml = REPO / "mlvae_tpu/models/MD_VAE/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "MD_VAE",
        "--model_name", "infer_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: 3, %s}}" % explicit_default_weights(model_yaml),
        "--debug", "--debug_batches", "1",
    ]
    train_cli.main(args)

    # pick a real wav + its canonicals from the synthesized corpus
    import json
    ann = json.loads(
        (tmp_path / "datasets/SynAudioMNIST/annotation/test.json").read_text()
    )
    utt = next(iter(ann.values()))
    results = infer_cli.main(
        args + ["--wav", utt["wav_path"],
                "--canonical", " ".join(utt["txt_gt_cnncl_seq"])]
    )
    assert len(results) == len(utt["txt_gt_cnncl_seq"])
    for r in results:
        assert set(r) == {"phoneme", "start_sec", "mispronounced"}
        assert 0.0 <= r["start_sec"] <= utt["duration"] + 0.1
