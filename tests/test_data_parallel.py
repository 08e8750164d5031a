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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_eval_with_ragged_last_batch(tmp_path, monkeypatch):
    """B % n_devices != 0: to_device_batch replica-pads the batch; eval-time
    prediction arrays must be trimmed back to the real batch before the
    per-sample metric loops index host ground truth (regression: IndexError
    on every DP VALID/TEST whose last batch didn't divide the mesh)."""
    monkeypatch.chdir(tmp_path)
    from pathlib import Path
    from mlvae_tpu.cli import train as train_cli

    REPO = Path(__file__).resolve().parent.parent
    model_yaml = REPO / "mlvae_tpu/models/MD_VAE/model.yaml"
    small = ("{model: {n_epochs: 3, feat_fc_size: 8, phn_recog_fc_size: 8, "
             "concat_fc_size: 8, rnn_size: 8, vae_unit_size: 8, "
             "latent_size: 4, dec_rnn_size: 8}, "
             # batch 5 over 8 devices: every batch replica-padded 5 -> 8
             "train_dataloader_opts: {batch_size: 5}, "
             "valid_dataloader_opts: {batch_size: 5}}")
    model = train_cli.main([
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "MD_VAE",
        "--model_name", "dp_ragged",
        "--model", f"!include:{model_yaml}",
        "--data_parallel", "True",
        "--extra_overrides", small,
        "--debug", "--debug_batches", "2",
    ])
    # epoch 3 = VAE target -> VALID ran evaluate_predictions under DP
    log_text = (tmp_path / "results/dp_ragged/train_log.txt").read_text()
    assert "plvl_md.F1" in log_text
