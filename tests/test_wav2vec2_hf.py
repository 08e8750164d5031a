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
