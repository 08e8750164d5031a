"""Smoke tests for the wav2vec2 recipe family, including the
saved-posteriors round trip into MD_VAE_sfl_saved_phn_recog."""
from conftest import explicit_default_weights
import os
import pickle
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("w2v_wd")
    old = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(old)


def _args(recipe, n_epochs=1, extra_model=""):
    model_yaml = REPO / f"mlvae_tpu/models/{recipe}/model.yaml"
    if recipe.startswith("w2v"):
        # shrink the (default wav2vec2-large) encoder for CPU smoke runs;
        # wav2vec2_size flows into both the encoder and the FC projections
        extra_model += ", wav2vec2_size: 64"
    weights = explicit_default_weights(model_yaml)
    overrides = "{model: {n_epochs: %d, %s%s}}" % (n_epochs, weights,
                                                   extra_model)
    return [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", recipe,
        "--model_name", f"{recipe}_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides", overrides,
        "--debug", "--debug_batches", "1",
    ]


def test_w2v_encoder_frame_rate():
    import jax
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder, conv_output_length

    enc = Wav2Vec2Encoder(source="", output_size=64)
    params = enc.init(jax.random.PRNGKey(0))
    import jax.numpy as jnp
    wavs = jnp.zeros((2, 16000))
    out = enc.apply(params, wavs)
    # 16000 samples -> 49 frames (320x downsampling, exact w2v2 topology);
    # fbank at 20 ms hop gives 51 -> diff in [-2, 0] like the reference
    assert out.shape == (2, conv_output_length(16000), 64)
    assert conv_output_length(16000) == 49


def test_w2v_encoder_freeze_blocks_grads():
    import jax
    import jax.numpy as jnp
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(source="", output_size=32, freeze=True)
    params = enc.init(jax.random.PRNGKey(0))

    def loss(p):
        return jnp.sum(enc.apply(p, jnp.ones((1, 3200))))

    grads = jax.grad(loss)(params)
    assert all(float(jnp.abs(g).max()) == 0.0
               for g in jax.tree_util.tree_leaves(grads))


@pytest.mark.parametrize("recipe", ["w2v_LSTM_FC", "w2v_MD_VAE"])
def test_w2v_recipe_smoke(workdir, recipe):
    from mlvae_tpu.cli import train as train_cli

    train_cli.main(_args(recipe))
    log = (workdir / f"results/{recipe}_smoke/train_log.txt").read_text()
    assert "loss" in log


def test_w2v_crdnn_cnncl_saves_posteriors_roundtrip(workdir):
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli

    # the reference yaml nulls both selection keys (training then raises at
    # the first VALID save, reference md_model.py:159-160) and ships a
    # CRDNN_CTC-sized trunk; the smoke run overrides a key and shrinks the
    # trunk exactly as a reference user must
    shrink = (", min_key: loss, cnn_blocks: 1"
              ", rnn_layers: 1, rnn_neurons: 32, rnn_bidirectional: False"
              ", dnn_blocks: 1, dnn_neurons: 64")
    train_cli.main(_args("w2v_CRDNN_CTC_cnncl", extra_model=shrink))
    test_cli.main(_args("w2v_CRDNN_CTC_cnncl", extra_model=shrink))
    saved = workdir / "results/w2v_CRDNN_CTC_cnncl_smoke/saved_phn_recog_outs.pkl"
    assert saved.exists()
    with open(saved, "rb") as f:
        pouts = pickle.load(f)
    assert len(pouts) > 0
    for arr in pouts.values():
        assert arr.ndim == 2 and arr.shape[1] == 14

    # consume them in MD_VAE_sfl_saved_phn_recog (needs outputs for every
    # utterance; extend with the train/valid sets' lengths)
    from mlvae_tpu.cli.experiment import prepare_experiment
    prepared = prepare_experiment(_args("MD_VAE"), prepare_exp_dir=False)
    rs = np.random.RandomState(0)
    for ds in prepared["datasets"]:
        for utt_id in ds.ids:
            if utt_id not in pouts:
                T = len(ds.data[utt_id]["feat"])
                pouts[utt_id] = rs.randn(T, 14).astype(np.float32)
    with open(workdir / "results/all_phn_recog_outs.pkl", "wb") as f:
        pickle.dump(pouts, f)

    args = _args("MD_VAE_sfl_saved_phn_recog", n_epochs=2,
                 extra_model=", phn_recog_outs_path: all_phn_recog_outs.pkl")
    train_cli.main(args)
    log = (workdir /
           "results/MD_VAE_sfl_saved_phn_recog_smoke/train_log.txt").read_text()
    assert "loss" in log


@pytest.mark.parametrize("bf16", [False, True], ids=["f32", "bf16"])
def test_w2v_frozen_feature_cache_bit_exact(workdir, monkeypatch, bf16):
    """The frozen-trunk feature cache (w2v_common.augment_device_batch)
    must be a pure dispatch-granularity change: same jit-compiled trunk
    computation, run once per cached batch instead of inside every step —
    the training losses with and without it are bit-identical.  The bf16
    arm pins the AMP-policy reproduction (cached features computed with
    the same bf16-cast params/wavs the in-step path would use)."""
    import re
    from mlvae_tpu.cli import train as train_cli

    tag = "bf" if bf16 else "f32"

    def run(name, cache_on):
        monkeypatch.setenv("MLVAE_W2V_FROZEN_CACHE",
                           "1" if cache_on else "0")
        args = _args("w2v_MD_VAE", n_epochs=2)
        args[args.index("--model_name") + 1] = name
        if bf16:
            args += ["--bf16", "True"]
        train_cli.main(args)
        log = (workdir / f"results/{name}/train_log.txt").read_text()
        return re.findall(r"loss: ([0-9.]+)", log)

    losses_cached = run(f"w2v_cacheA_{tag}", True)
    losses_plain = run(f"w2v_cacheB_{tag}", False)
    assert losses_cached and losses_cached == losses_plain
