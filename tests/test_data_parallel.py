"""Data-parallel correctness on the 8-device CPU mesh: the fused train step
under a sharded batch must produce the same loss and parameter update as
single-device execution (XLA inserts the gradient psum; the math must not
change)."""
from conftest import explicit_default_weights
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
def test_dp_fit_checkpoint_test_roundtrip(tmp_path, monkeypatch):
    """Fit-level DP coverage (not just one step): drive ``cli.train
    --data_parallel True`` through 3 epochs (full target cycle, so epoch 3
    runs the DP VALID eval + decode + metric gather), assert the
    metric-keyed checkpoint was saved, then drive ``cli.test`` over the
    same mesh — which must recall the best checkpoint by ``max_key
    plvl_md.F1`` and write the TEST outputs.

    batch_size 5 over 8 devices also keeps the ragged-batch regression
    covered: to_device_batch replica-pads 5 -> 8 and eval-time prediction
    arrays must be trimmed back before the per-sample metric loops index
    host ground truth (was: IndexError on every DP VALID/TEST whose batch
    didn't divide the mesh)."""
    monkeypatch.chdir(tmp_path)
    from pathlib import Path
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli

    REPO = Path(__file__).resolve().parent.parent
    model_yaml = REPO / "mlvae_tpu/models/MD_VAE/model.yaml"
    small = ("{model: {n_epochs: 3, %s, feat_fc_size: 8, phn_recog_fc_size: 8, "
             "concat_fc_size: 8, rnn_size: 8, vae_unit_size: 8, "
             "latent_size: 4, dec_rnn_size: 8}, "
             # batch 5 over 8 devices: every batch replica-padded 5 -> 8
             "train_dataloader_opts: {batch_size: 5}, "
             "valid_dataloader_opts: {batch_size: 5}, "
             "test_dataloader_opts: {batch_size: 5}}"
             % explicit_default_weights(model_yaml))
    args = [
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
    ]
    model = train_cli.main(args)
    assert model.mesh is not None and model.mesh.size == 8
    # epoch 3 = VAE target -> VALID ran evaluate_predictions under DP
    out_dir = tmp_path / "results/dp_ragged"
    log_text = (out_dir / "train_log.txt").read_text()
    assert "plvl_md.F1" in log_text
    # ... and the VALID stage checkpointed with the metric-keyed meta
    # (reference md_model.py:151-164)
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert len(ckpts) >= 1, ckpts

    # cli.test on the same mesh: recalls the best ckpt by plvl_md.F1
    # (on_evaluate_start raises if no checkpoint carries the key) and
    # runs the DP TEST epoch incl. ragged metric gather + output files
    model2 = test_cli.main(args)
    assert model2.mesh is not None and model2.mesh.size == 8
    test_metrics = out_dir / "test_output/test_metrics.txt"
    assert test_metrics.exists()
    assert "plvl_md" in test_metrics.read_text()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_scan_epoch_matches_dp_loop():
    """--scan_epoch under data parallelism: the lax.scan-over-batches epoch
    on an 8-device mesh must produce the same losses and updated params as
    the per-batch DP loop (and both must agree with single-device math,
    which test_scan_epoch.py + test_dp_step_matches_single_device pin)."""
    from mlvae_tpu.parallel.mesh import make_mesh, replicate

    class _FakeLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

    class _FakeBatch(dict):
        def __init__(self, data, ids):
            super().__init__(data)
            self.ids = ids
            self["id"] = ids

        def keys(self):
            return [k for k in super().keys() if k != "id"]

    small = {
        "phn_rnn_hidden_size": 64, "boundary_rnn_hidden_size": 64,
        "rnn_hidden_size": 64, "dec_rnn_hidden_size": 64,
        "phn_rnn_num_layers": 1, "boundary_rnn_num_layers": 1,
        "rnn_num_layers": 1, "dec_rnn_num_layers": 1,
    }

    def batches():
        out = []
        for i, T in enumerate([32, 32, 48]):
            b = synth_batch(batch_size=8, T=T, L=4, seed=200 + i)
            out.append(_FakeBatch(b, [f"u{i}_{j}" for j in range(8)]))
        return out

    def run(scanned: bool):
        model = build_md_vae(batch_size=8, overrides=dict(small))
        model.target = Target.VAE
        model.scan_epoch = scanned
        model.init_params()
        model.ensure_states(120)
        model.init_optimizers()
        mesh = make_mesh(8)
        model.mesh = mesh
        model.params = replicate(mesh, model.params)
        model.opt_states = replicate(mesh, model.opt_states)
        model.states = replicate(mesh, model.states)
        model.rng = jax.random.PRNGKey(13)
        bs = batches()
        if scanned:
            mean_loss, _ = model._fit_epoch_scanned(_FakeLoader(bs))
        else:
            losses = [float(np.asarray(model.fit_batch(b))) for b in bs]
            mean_loss = float(np.mean(losses))
        return mean_loss, model.params, model.rng

    loss_a, params_a, rng_a = run(False)
    loss_b, params_b, rng_b = run(True)
    assert np.allclose(loss_a, loss_b, rtol=1e-5), (loss_a, loss_b)
    assert jnp.array_equal(rng_a, rng_b)

    def check(path, va, vb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, params_a, params_b)


def test_dp_zero1_matches_replicated_opt_state():
    """ZeRO-1 (--zero1, parallel/zero1.py): the same DP train step with
    optimizer moments SHARDED over the data axis must produce the same
    updated params as the replicated-optimizer step (the sharding
    annotations only move where the Adam elementwise math runs), while the
    resident opt-state bytes per device drop to ~1/n."""
    from mlvae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mlvae_tpu.parallel.zero1 import moment_shard_fraction

    B = 16
    batch = synth_batch(batch_size=B, T=48, L=6)

    def run(zero1: bool):
        model = build_md_vae(batch_size=B)
        model.target = Target.VAE
        model.init_params()
        model.ensure_states(120)
        model.init_optimizers()
        mesh = make_mesh(8)
        model.mesh = mesh
        model.run_opts["zero1"] = zero1
        model.params = replicate(mesh, model.params)
        model.opt_states = replicate(mesh, model.opt_states)
        model.states = replicate(mesh, model.states)
        from jax.sharding import PartitionSpec as P
        specs = {k: jax.tree_util.tree_map(lambda _: P(), v)
                 for k, v in model.params.items()}
        model._setup_zero1(specs)
        if zero1:
            assert model._zero1_opts
        b = shard_batch(mesh, batch)
        step = model._get_compiled("train", Stage.TRAIN)
        params, opt_states, _, loss, _ = step(
            model.params, model.opt_states, model.states,
            jax.random.PRNGKey(7), b, jnp.asarray(3, jnp.int32),
        )
        return float(loss), params, opt_states, mesh

    loss_r, params_r, _, _ = run(False)
    loss_z, params_z, opt_z, mesh = run(True)

    assert abs(loss_r - loss_z) / abs(loss_r) < 1e-5, (loss_r, loss_z)

    def check(path, va, vb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, params_r, params_z)

    frac = moment_shard_fraction(opt_z, mesh)
    assert frac <= 1.0 / 8 + 0.1, frac
