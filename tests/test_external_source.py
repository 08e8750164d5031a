"""External-source dataset + DNN-HMM scoring path (reference
``test_external.py`` call stack, SURVEY §3.4)."""
import json
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_external_source_and_metrics(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli.experiment import prepare_experiment
    from mlvae_tpu.data.data_io_external_source import prepare_datasets
    from mlvae_tpu.metrics.dnn_hmm import compute_dnn_hmm_metrics

    # build the computed dataset cache via the normal path
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "ext_smoke",
        "--model",
        f"!include:{REPO / 'mlvae_tpu/models/test_vanilla_vae/model.yaml'}",
    ]
    prepared = prepare_experiment(args, prepare_exp_dir=False)
    hparams = prepared["hparams"]
    test_ds = prepared["datasets"][2]

    # craft external DNN-HMM results: ground-truth segments, all-'sil' phones
    ext = {}
    for utt_id in test_ds.ids:
        s = test_ds[utt_id]
        segs = np.asarray(s["gt_seg_seq"], np.float64)
        ext[utt_id] = [[float(a), float(b), "sil"] for a, b in segs]
    ext_dir = Path("datasets/SynAudioMNIST/external_data")
    ext_dir.mkdir(parents=True)
    (ext_dir / "dnn_hmm_test.json").write_text(json.dumps(ext))

    datasets, label_encoder = prepare_datasets(hparams)
    s = datasets[2][0]
    assert "ext_dnn_hmm_boundary_seq" in s
    assert s["ext_dnn_hmm_boundary_seq"].sum() == len(s["gt_phn_seq"])
    # all-sil external phones vs non-sil canonicals -> md labels mostly 1
    assert s["ext_plvl_dnn_hmm_md_lbl_seq"].max() == 1

    metrics = compute_dnn_hmm_metrics(datasets[2])
    assert "boundary.f1" in metrics["fa"]
    assert "MD.ACC" in metrics["asr"]
    # external segments equal ground truth -> near-perfect boundary recall
    assert metrics["asr"]["boundary.rec"] > 90
