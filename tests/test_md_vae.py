"""MD_VAE flagship recipe end-to-end: target cycling, in-step device decode,
MD/boundary metrics, checkpoint-on-F1, saved-MD-results round trip."""
import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _args(n_epochs=3, extra=""):
    model_yaml = REPO / "mlvae_tpu/models/MD_VAE/model.yaml"
    return [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "MD_VAE",
        "--model_name", "mdvae_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: %d}}" % n_epochs,
        "--debug", "--debug_batches", "2",
    ]


def test_md_vae_train_eval_roundtrip(workdir):
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli
    from mlvae_tpu.models.MD_VAE.model import Target

    # 3 epochs covers the full PHN_RECOG -> B_DETECTOR -> VAE target cycle;
    # the VAE epoch triggers evaluation + checkpointing on plvl_md.F1
    model = train_cli.main(_args(n_epochs=3))
    assert model.target == Target.VAE
    out_dir = workdir / "results/mdvae_smoke"
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert len(ckpts) >= 1
    meta = json.loads((ckpts[0] / "meta.json").read_text())
    assert "plvl_md.F1" in meta

    log_text = (out_dir / "train_log.txt").read_text()
    assert "pi_nll_loss" in log_text
    assert "plvl_md.F1" in log_text

    # TEST: metrics written + saved MD results json for the cleaning loop
    test_cli.main(_args())
    metrics_text = (out_dir / "test_output/test_metrics.txt").read_text()
    assert "plvl_md.F1" in metrics_text
    saved = workdir / "datasets/SynAudioMNIST/saved_md_results/mdvae_smoke.json"
    assert saved.exists()
    md_results = json.loads(saved.read_text())
    assert len(md_results) > 0
    for utt_results in md_results.values():
        for idx, start_pct, end_pct in utt_results:
            assert 0 <= start_pct < end_pct <= 1

    # round trip: apply saved MD results as data cleaning in a new run.
    # A 3-epoch debug model may flag nothing, so craft a deterministic flag
    # for one utterance (phoneme 1, frames 25%-50%) and verify the cleaner
    # excises it everywhere.
    from mlvae_tpu.cli.experiment import prepare_experiment
    base = prepare_experiment(_args(), prepare_exp_dir=False)["datasets"][2]
    utt_id = base.ids[0]
    crafted = {u: [] for u in md_results}
    crafted[utt_id] = [[1, 0.25, 0.5]]
    saved.write_text(json.dumps(crafted))

    args = _args() + ["--saved_md_results_model_name", "mdvae_smoke"]
    ds_clean = prepare_experiment(args, prepare_exp_dir=False)["datasets"][2]
    n_before_p = len(base.data[utt_id]["gt_phn_seq"])
    n_after_p = len(ds_clean.data[utt_id]["gt_phn_seq"])
    assert n_after_p == n_before_p - 1
    n_before_f = len(base.data[utt_id]["feat"])
    n_after_f = len(ds_clean.data[utt_id]["feat"])
    assert n_after_f == n_before_f - (round(0.5 * n_before_f)
                                      - round(0.25 * n_before_f))
