"""Numerical parity of our wav2vec2 encoder vs transformers' torch model.

The reference recipes load ``facebook/wav2vec2-large-lv60`` through
SpeechBrain's ``HuggingFaceWav2Vec2`` wrapper.  We cannot download weights in
this environment, so the parity oracle is a *tiny randomly-initialized* HF
``Wav2Vec2Model`` saved to disk: our encoder must (a) discover the local
snapshot, (b) adopt its config, (c) convert its weights, and (d) reproduce
``last_hidden_state`` to ~1e-4.  Both HF families are covered: base-style
(group-norm extractor, post-LN encoder) and large-lv60-style (layer-norm
extractor, conv biases, pre-LN "stable layer norm" encoder).
"""
from conftest import explicit_default_weights
import numpy as np
import pytest


def _make_hf(snap_dir, stable):
    torch = pytest.importorskip("torch")
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2], num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2,
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group",
        conv_bias=stable, apply_spec_augment=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    model = Wav2Vec2Model(cfg).eval()
    model.save_pretrained(snap_dir)
    return model


@pytest.mark.parametrize("stable", [False, True],
                         ids=["base-groupnorm", "large-stable-ln"])
def test_wav2vec2_matches_hf(tmp_path, stable):
    import torch
    import jax
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder

    snap = tmp_path / "snap"
    model = _make_hf(snap, stable)

    enc = Wav2Vec2Encoder(source=str(snap), output_norm=False,
                          normalize_wav=False, freeze=True)
    assert enc.do_stable_layer_norm == stable
    assert enc.hidden_size == 32 and enc.num_hidden_layers == 2
    params = enc.init(jax.random.PRNGKey(0))
    # weights load lazily at init (host copy released after transfer)
    assert enc._pretrained_loaded

    rs = np.random.RandomState(1)
    wav = rs.randn(3, 2000).astype(np.float32)
    ours = np.asarray(enc.apply(params, wav))
    with torch.no_grad():
        theirs = model(torch.from_numpy(wav)).last_hidden_state.numpy()

    assert ours.shape == theirs.shape
    err = np.max(np.abs(ours - theirs))
    assert err < 1e-4, f"max abs err {err}"


def test_wav2vec2_output_norm_and_wav_norm(tmp_path):
    """The SB-wrapper conveniences on top of the bare model: waveform
    normalization and output norm, both F.layer_norm(x, x.shape) —
    whole-tensor statistics (reference quirk)."""
    import jax
    import jax.numpy as jnp
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(source="", output_size=32, output_norm=True,
                          normalize_wav=True)
    params = enc.init(jax.random.PRNGKey(0))
    wav = 7.0 + 3.0 * jax.random.normal(jax.random.PRNGKey(1), (2, 3200))
    out = enc.apply(params, wav)
    # output_norm => zero mean / unit var over the WHOLE output tensor
    assert abs(float(out.mean())) < 1e-4
    assert abs(float(out.var()) - 1.0) < 1e-3
    # normalize_wav => invariant to waveform affine rescaling
    out2 = enc.apply(params, 0.1 * (wav - 7.0) / 3.0)
    assert float(jnp.abs(out - out2).max()) < 1e-3


def test_norms_match_sb_whole_tensor_layer_norm():
    """normalize_wav/output_norm reproduce the SB wrapper's
    F.layer_norm(x, x.shape): ONE mean/var over the entire padded batch
    tensor (reference quirk), not per-utterance stats."""
    import jax.numpy as jnp
    import torch
    from mlvae_tpu.modules.wav2vec2 import _whole_tensor_norm

    rs = np.random.RandomState(3)
    x = rs.randn(3, 50).astype(np.float32) * 2 + 1
    ours = np.asarray(_whole_tensor_norm(jnp.asarray(x), eps=1e-5))
    theirs = torch.nn.functional.layer_norm(
        torch.from_numpy(x), list(x.shape)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_encoder_dropout_fires_when_finetuning(tmp_path):
    """freeze: False recipes train the trunk: the HF per-layer dropouts
    (attention probs, post-attention, FFN) must actually fire under
    train=True (they were previously accepted but never applied)."""
    import jax
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder

    enc = Wav2Vec2Encoder(source="", output_size=32, freeze=False,
                          output_norm=False, normalize_wav=False,
                          hidden_dropout=0.5, attention_dropout=0.5,
                          feat_proj_dropout=0.0)
    params = enc.init(jax.random.PRNGKey(0))
    wav = np.random.RandomState(5).randn(2, 2000).astype(np.float32)

    eval1 = np.asarray(enc.apply(params, wav, train=False))
    eval2 = np.asarray(enc.apply(params, wav, train=False))
    np.testing.assert_array_equal(eval1, eval2)  # eval is deterministic

    tr1 = np.asarray(enc.apply(params, wav, rng=jax.random.PRNGKey(1),
                               train=True))
    tr2 = np.asarray(enc.apply(params, wav, rng=jax.random.PRNGKey(2),
                               train=True))
    assert not np.allclose(tr1, eval1)
    assert not np.allclose(tr1, tr2)

    # frozen trunk ignores train=True entirely (reference freeze semantics)
    enc_frozen = Wav2Vec2Encoder(source="", output_size=32, freeze=True,
                                 output_norm=False, normalize_wav=False,
                                 hidden_dropout=0.5, attention_dropout=0.5)
    pf = enc_frozen.init(jax.random.PRNGKey(0))
    f1 = np.asarray(enc_frozen.apply(pf, wav, rng=jax.random.PRNGKey(1),
                                     train=True))
    f2 = np.asarray(enc_frozen.apply(pf, wav, train=False))
    np.testing.assert_array_equal(f1, f2)


def test_large_lv60_config_adoption(tmp_path):
    """The flagship recipes name ``facebook/wav2vec2-large-lv60``
    (reference ``w2v_MD_VAE/model.yaml:11-15``).  Write that model's
    actual config.json locally (architecture fields from the published HF
    config) and verify the encoder adopts the FULL large-lv60 topology —
    24 pre-LN layers, 1024 hidden, 16 heads, layer-norm extractor with
    conv biases — via the snapshot-config discovery path (construction
    only; 317M-param init is exercised at tiny scale elsewhere)."""
    import json

    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder, conv_output_length

    snap = tmp_path / "wav2vec2-large-lv60"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps({
        "model_type": "wav2vec2",
        "architectures": ["Wav2Vec2ForPreTraining"],
        "hidden_size": 1024, "num_hidden_layers": 24,
        "num_attention_heads": 16, "intermediate_size": 4096,
        "conv_dim": [512, 512, 512, 512, 512, 512, 512],
        "conv_kernel": [10, 3, 3, 3, 3, 2, 2],
        "conv_stride": [5, 2, 2, 2, 2, 2, 2],
        "conv_bias": True, "feat_extract_norm": "layer",
        "do_stable_layer_norm": True,
        "num_conv_pos_embeddings": 128,
        "num_conv_pos_embedding_groups": 16,
        "layer_norm_eps": 1e-5,
        "hidden_dropout": 0.1, "attention_dropout": 0.1,
        "feat_proj_dropout": 0.1, "activation_dropout": 0.1,
    }))

    enc = Wav2Vec2Encoder(source=str(snap), output_size=1024)
    assert enc.hidden_size == 1024 and enc.num_hidden_layers == 24
    assert enc.num_attention_heads == 16 and enc.intermediate_size == 4096
    assert enc.do_stable_layer_norm and enc.conv_bias
    assert enc.feat_extract_norm == "layer"
    assert enc.conv_kernel == (10, 3, 3, 3, 3, 2, 2)
    assert enc.conv_stride == (5, 2, 2, 2, 2, 2, 2)
    # 320x downsampling of 16 kHz audio -> 49 frames/sec, the rate the
    # recipes re-pad against fbank's 50/sec (w2v_MD_VAE/model.py:35-40)
    assert enc.conv_output_length(16000) == conv_output_length(
        16000, kernels=enc.conv_kernel, strides=enc.conv_stride) == 49
    assert enc._has_snapshot and not enc._pretrained_loaded


def test_pretrained_snapshot_through_recipe_fit(tmp_path, monkeypatch):
    """End-to-end pretrained-weights evidence at recipe level (not just
    the encoder): point w2v_MD_VAE's yaml at a local large-lv60-FAMILY
    snapshot (stable-LN topology at test scale), drive cli.train through
    a debug fit, and assert the recipe's parameter tree actually carries
    the converted HF weights — bit-identical after training, because the
    yaml freezes the encoder (reference freeze: True semantics)."""
    import jax
    import torch
    from pathlib import Path

    monkeypatch.chdir(tmp_path)
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.modules.wav2vec2 import params_from_hf_model

    REPO = Path(__file__).resolve().parent.parent
    snap = tmp_path / "snap"
    hf = _make_hf(snap, stable=True)
    expected = params_from_hf_model(hf)

    weights = explicit_default_weights(
        REPO / "mlvae_tpu/models/w2v_MD_VAE/model.yaml")
    overrides = ("{model: {n_epochs: 1, wav2vec2_size: 32, %s, "
                 "wav2vec2: {source: %s}}}" % (weights, snap))
    model = train_cli.main([
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "w2v_MD_VAE",
        "--model_name", "w2v_pretrained",
        "--model", f"!include:{REPO}/mlvae_tpu/models/w2v_MD_VAE/model.yaml",
        "--extra_overrides", overrides,
        "--debug", "--debug_batches", "1",
    ])

    enc = model.modules["wav2vec2"]
    assert enc._pretrained_loaded and enc.do_stable_layer_norm
    got = model.params["wav2vec2"]
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    flat_exp = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(expected))
    assert len(flat_got) == len(flat_exp) > 0
    for path, value in flat_got:
        np.testing.assert_array_equal(
            np.asarray(value), np.asarray(flat_exp[jax.tree_util.keystr(path)]),
            err_msg=jax.tree_util.keystr(path))
    log = (tmp_path / "results/w2v_pretrained/train_log.txt").read_text()
    assert "loss" in log
