"""Checkpoint/resume: a fresh process (fresh model object) resumes training
from the newest checkpoint — params, optimizer state, normalizer statistics,
and the epoch counter all restored (reference recovery = checkpoint resume
only, SURVEY §5)."""
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _args(n_epochs):
    from conftest import explicit_default_weights

    model_yaml = REPO / "mlvae_tpu/models/test_vanilla_vae/model.yaml"
    weights = explicit_default_weights(model_yaml)
    return [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "test_vanilla_vae",
        "--model_name", "resume_test",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: %d, %s}}" % (n_epochs, weights),
        "--debug", "--debug_batches", "1",
    ]


def test_resume_from_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli

    model1 = train_cli.main(_args(2))
    params_after_2 = np.asarray(model1.params["encoder"]["mean_fc"]["weight"])
    count_after_2 = float(model1.states["normalizer"]["count"])
    ckpts = list((tmp_path / "results/resume_test/checkpoints").iterdir())
    assert ckpts

    # "new process": a fresh model instance; fit with a higher epoch limit
    model2 = train_cli.main(_args(4))
    # resumed: epochs 3 and 4 ran on top of the restored state. Stats freeze
    # from epoch 3 (update_until_epoch), so the count must EQUAL the restored
    # value — a fresh (non-restored) run of epochs 3-4 would leave it at 0.
    assert model2.hparams["epoch_counter"].current == 4
    count_after_4 = float(model2.states["normalizer"]["count"])
    assert count_after_4 == count_after_2 > 0
    # parameters moved on from (not equal to) the 2-epoch state
    params_after_4 = np.asarray(model2.params["encoder"]["mean_fc"]["weight"])
    assert not np.allclose(params_after_4, params_after_2)

    log = (tmp_path / "results/resume_test/train_log.txt").read_text()
    # epochs 1-2 from run 1, 3-4 from run 2; epoch 1/2 not re-run in run 2
    assert log.count("stage: train, epoch: 2") == 1
    assert "stage: train, epoch: 3" in log


def test_checkpoint_shape_mismatch_names_parameter(tmp_path):
    """Restoring into a model whose architecture changed must fail with an
    error naming the mismatched parameter, not an XLA shape error deep in
    jit (regression: pretrained wav2vec2 snapshot appearing mid-experiment
    changed layer shapes under a saved checkpoint)."""
    import numpy as np
    from mlvae_tpu.training.checkpointer import Checkpointer

    saved = {"enc": {"w": np.zeros((4, 8), np.float32)}}
    ckpt = Checkpointer(tmp_path)
    c = ckpt.save_checkpoint({"model": saved}, meta={"epoch": 1})

    grown = {"enc": {"w": np.zeros((4, 16), np.float32)}}
    with pytest.raises(ValueError, match=r"shape mismatch.*\['enc'\]\['w'\]"):
        ckpt.load_checkpoint(c, templates={"model": grown})


def test_orbax_backend_round_trip(tmp_path):
    """backend='orbax' stores via orbax.checkpoint; restore goes through the
    same templates/shape-check path as npz (SURVEY §5 'orbax-style
    checkpointing')."""
    import numpy as np
    from mlvae_tpu.training.checkpointer import Checkpointer

    state = {"model": {"enc": {"w": np.arange(12, dtype=np.float32)
                               .reshape(3, 4),
                               "b": np.ones((4,), np.float32)},
                       "step": np.asarray(7, np.int32)}}
    ckpt = Checkpointer(tmp_path, backend="orbax")
    c = ckpt.save_checkpoint(state, meta={"epoch": 2, "plvl_md.F1": 33.3})
    assert (c.path / "model.orbax").exists()

    template = {"model": {"enc": {"w": np.zeros((3, 4), np.float32),
                                  "b": np.zeros((4,), np.float32)},
                          "step": np.asarray(0, np.int32)}}
    restored = ckpt.load_checkpoint(c, templates=template)
    np.testing.assert_array_equal(restored["model"]["enc"]["w"],
                                  state["model"]["enc"]["w"])
    assert int(restored["model"]["step"]) == 7

    # metric-keyed retrieval works identically across backends
    best = ckpt.find_checkpoint(max_key="plvl_md.F1")
    assert best is not None and best.meta["epoch"] == 2

    with pytest.raises(ValueError, match="unknown checkpoint backend"):
        Checkpointer(tmp_path, backend="flatbuffer")


def test_resume_tolerates_opt_state_layout_change(tmp_path, monkeypatch,
                                                  caplog):
    """A checkpoint whose optimizer-state pytree predates the current layout
    (e.g. the move to one-state-per-module) must resume params/states with a
    LOUD warning and fresh optimizer moments — not crash with a KeyError
    (params restore fine, so the raw error was opaque)."""
    import logging

    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli

    train_cli.main(_args(2))
    ckpts = sorted((tmp_path / "results/resume_test/checkpoints").iterdir())
    # mangle the saved optimizer state into a foreign layout: rename keys
    for ckpt_dir in ckpts:
        for npz_path in ckpt_dir.glob("opt__*.npz"):
            with np.load(npz_path, allow_pickle=False) as data:
                flat = {f".legacy{k}": data[k] for k in data.files}
            np.savez(npz_path, **flat)

    with caplog.at_level(logging.WARNING):
        model2 = train_cli.main(_args(4))
    assert model2.hparams["epoch_counter"].current == 4
    assert any("optimizer-state" in r.message for r in caplog.records)

    log = (tmp_path / "results/resume_test/train_log.txt").read_text()
    assert log.count("stage: train, epoch: 2") == 1  # epochs 1-2 not re-run
    assert "stage: train, epoch: 3" in log


def test_params_layout_change_still_raises(tmp_path):
    """Only opt__* recoverables fall back; a params layout change is a real
    architecture problem and must raise the named mismatch error."""
    import numpy as np
    from mlvae_tpu.training.checkpointer import (Checkpointer,
                                                 CheckpointKeyMismatch)

    ckpt = Checkpointer(tmp_path)
    c = ckpt.save_checkpoint(
        {"params": {"enc": {"w": np.zeros((2, 2), np.float32)}}},
        meta={"epoch": 1})
    with pytest.raises(CheckpointKeyMismatch, match="params"):
        ckpt.load_checkpoint(
            c, templates={"params": {"enc2": {"w": np.zeros((2, 2),
                                                            np.float32)}}})


def test_ckpt_opt_state_false_reference_parity(tmp_path, monkeypatch):
    """--ckpt_opt_state False: snapshots carry no optimizer state (the
    reference's recoverables never include optimizers) and a resumed fit
    restarts cleanly with fresh moments."""
    import os
    from conftest import explicit_default_weights
    from mlvae_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yaml = f"{repo}/mlvae_tpu/models/test_vanilla_vae/model.yaml"
    weights = explicit_default_weights(yaml)
    args = [
        f"{repo}/config/run.yaml",
        "--dataset", "SynAudioMNIST", "--language", "digits",
        "--n_phonemes", "12", "--model_class", "test_vanilla_vae",
        "--model_name", "noopt", "--noprogressbar", "True",
        "--ckpt_opt_state", "False",
        "--model", f"!include:{yaml}",
        "--extra_overrides", "{model: {n_epochs: 2, %s}}" % weights,
    ]
    train_cli.main(args)
    ckpts = sorted((tmp_path / "results/noopt/checkpoints").glob("CKPT-*"))
    assert ckpts
    files = {p.name for p in ckpts[-1].iterdir()}
    assert not any(f.startswith("opt__") for f in files), files
    assert any(f.startswith("params") for f in files), files

    # resume (fresh moments) and extend by one epoch — must not raise
    args[args.index("--extra_overrides") + 1] = \
        "{model: {n_epochs: 3, %s}}" % weights
    train_cli.main(args)
    log = (tmp_path / "results/noopt/train_log.txt").read_text()
    assert "epoch: 3" in log
