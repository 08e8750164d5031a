"""Data-parallel correctness on the 8-device CPU mesh: the fused train step
under a sharded batch must produce the same loss and parameter update as
single-device execution (XLA inserts the gradient psum; the math must not
change)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlvae_tpu.bench_utils import build_md_vae, synth_batch
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.training.brain import Stage


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_step_matches_single_device():
    B = 16
    batch = synth_batch(batch_size=B, T=48, L=6)

    def run(mesh_devices):
        model = build_md_vae(batch_size=B)
        model.target = Target.VAE
        model.init_params()
        model.ensure_states(120)
        model.init_optimizers()
        if mesh_devices:
            from mlvae_tpu.parallel.mesh import make_mesh, replicate, \
                shard_batch
            mesh = make_mesh(mesh_devices)
            model.params = replicate(mesh, model.params)
            model.opt_states = replicate(mesh, model.opt_states)
            model.states = replicate(mesh, model.states)
            b = shard_batch(mesh, batch)
        else:
            b = batch
        step = model._get_compiled("train", Stage.TRAIN)
        params, _, _, loss, losses = step(
            model.params, model.opt_states, model.states,
            jax.random.PRNGKey(7), b, jnp.asarray(3, jnp.int32),
        )
        return float(loss), losses, params

    loss1, losses1, params1 = run(None)
    loss8, losses8, params8 = run(8)

    assert abs(loss1 - loss8) / abs(loss1) < 1e-4, (loss1, loss8)
    for key in losses1:
        a, b = float(losses1[key]), float(losses8[key])
        assert abs(a - b) / max(abs(a), 1e-6) < 1e-3, (key, a, b)
    # updated parameters agree (grads were psum'd correctly)
    leaf1 = np.asarray(params1["pi_fc"]["lin0"]["weight"])
    leaf8 = np.asarray(params8["pi_fc"]["lin0"]["weight"])
    np.testing.assert_allclose(leaf1, leaf8, rtol=1e-4, atol=1e-5)
