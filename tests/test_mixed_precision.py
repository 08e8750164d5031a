"""Mixed-precision (bf16 compute) training path: finite losses, f32 params
preserved, loss close to the f32 step."""
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvae_tpu.bench_utils import build_md_vae, synth_batch
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.training.brain import Stage


def _one_step(bf16: bool):
    model = build_md_vae(batch_size=8)
    model.target = Target.VAE
    model.run_opts["bf16"] = bf16
    model.auto_mix_prec = bf16
    model.init_params()
    batch = synth_batch(batch_size=8, T=48, L=6)
    model.ensure_states(120)
    model.init_optimizers()
    step = model._get_compiled("train", Stage.TRAIN)
    params, _, states, loss, losses = step(
        model.params, model.opt_states, model.states,
        jax.random.PRNGKey(3), batch, jnp.asarray(3, jnp.int32),
    )
    return float(loss), losses, params, states


def test_bf16_step_close_to_f32():
    loss32, losses32, params32, states32 = _one_step(False)
    loss16, losses16, params16, states16 = _one_step(True)
    assert np.isfinite(loss16)
    # same model/inputs/rng: bf16 forward must track the f32 loss closely
    assert abs(loss16 - loss32) / abs(loss32) < 0.05, (loss16, loss32)
    # parameters and optimizer-visible state remain f32
    for leaf in jax.tree_util.tree_leaves(params16):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(states16):
        assert leaf.dtype == jnp.float32


def test_amp_preserves_length_vectors():
    """Relative-length vectors must never be cast to bf16 (round(rel*T)
    recovers absolute lengths; bf16 corrupts them by 1-2 frames)."""
    from mlvae_tpu.training.brain import _cast_floats
    lens = jnp.asarray([511.0 / 512.0, 509.0 / 512.0])
    batch = {"feat": (jnp.zeros((2, 512, 4)), lens)}
    cast = _cast_floats(batch, jnp.bfloat16, min_ndim=2)
    assert cast["feat"][0].dtype == jnp.bfloat16
    assert cast["feat"][1].dtype == jnp.float32
    assert int(round(float(cast["feat"][1][0]) * 512)) == 511


def test_nonfinite_grads_do_not_poison_params():
    """A NaN loss step must leave params finite (zero-grad skip, not g*0)."""
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    model = build_md_vae(batch_size=8)
    model.target = Target.VAE
    model.init_params()
    batch = synth_batch(batch_size=8, T=48, L=6)
    # poison the features with NaN -> loss and grads become non-finite
    feats, lens = batch["feat"]
    batch["feat"] = (feats.at[0, 0, 0].set(jnp.nan), lens)
    model.ensure_states(120)
    model.init_optimizers()
    step = model._get_compiled("train", Stage.TRAIN)
    params, _, _, loss, _ = step(
        model.params, model.opt_states, model.states,
        jax.random.PRNGKey(0), batch, jnp.asarray(3, jnp.int32),
    )
    assert not np.isfinite(float(loss))  # the loss itself is bad...
    for leaf in jax.tree_util.tree_leaves(params):  # ...but params survive
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_reaches_every_recurrence():
    """Regression: the normalizer's f32 running stats used to promote the
    whole downstream graph back to f32, making AMP a silent no-op.  Under
    AMP every LSTM layer must see a bf16 input stream."""
    import mlvae_tpu.nn.rnn as rnn
    from mlvae_tpu.training.brain import _cast_floats

    seen = []
    orig = rnn._lstm_layer

    def spy(x, h0, c0, w_ih, w_hh, b_ih, b_hh, reverse=False):
        seen.append(x.dtype)
        return orig(x, h0, c0, w_ih, w_hh, b_ih, b_hh, reverse)

    model = build_md_vae(batch_size=8)
    model.auto_mix_prec = True
    model.target = Target.VAE
    model.init_params()
    batch = synth_batch(batch_size=8, T=32, L=4)
    model.ensure_states(120)

    p = _cast_floats(model.params, jnp.bfloat16)
    b = _cast_floats(batch, jnp.bfloat16, min_ndim=2)
    s = _cast_floats(model.states, jnp.bfloat16, min_ndim=1)

    rnn._lstm_layer = spy
    try:
        jax.eval_shape(
            lambda p, s, b: model.compute_forward(
                p, s, b, Stage.TRAIN, jax.random.PRNGKey(0),
                jnp.asarray(3, jnp.int32)),
            p, s, b,
        )
    finally:
        rnn._lstm_layer = orig

    assert seen, "no LSTM layers traced"
    assert all(d == jnp.bfloat16 for d in seen), seen


def test_bf16_reaches_gru_recurrence():
    """Same guard for the GRU path (conv/GRU VAE gate configs): a bf16
    input stream must reach the recurrence un-promoted, and the output
    must stay bf16."""
    import mlvae_tpu.nn.rnn as rnn
    from mlvae_tpu.nn.rnn import GRU

    seen = []
    orig = rnn._gru_layer

    def spy(x, h0, w_ih, w_hh, b_ih, b_hh, reverse=False):
        seen.append(x.dtype)
        return orig(x, h0, w_ih, w_hh, b_ih, b_hh, reverse)

    gru = GRU(24, 32, num_layers=2, batch_first=True, bidirectional=True)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        gru.init(jax.random.PRNGKey(0)),
    )
    x = jnp.zeros((4, 16, 24), jnp.bfloat16)

    rnn._gru_layer = spy
    try:
        out = jax.eval_shape(lambda p, x: gru.apply(p, x)[0], params, x)
    finally:
        rnn._gru_layer = orig

    assert seen, "no GRU layers traced"
    assert all(d == jnp.bfloat16 for d in seen), seen
    assert out.dtype == jnp.bfloat16, out.dtype
