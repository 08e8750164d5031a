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
