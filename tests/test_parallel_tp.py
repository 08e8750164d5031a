"""Tensor-parallel wav2vec2: sharded execution must be numerically the
same program as single-device execution (XLA GSPMD only changes placement),
and the DP x TP training-step dryrun must run end to end."""
import numpy as np
import pytest


def test_w2v_tp_matches_replicated():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder
    from mlvae_tpu.parallel.tp import (
        make_mesh_2d, wav2vec2_partition_specs, shard_tree, validate_tp)

    enc = Wav2Vec2Encoder(source="", output_size=64, normalize_wav=False,
                          output_norm=False)
    assert validate_tp(enc, 2) is None
    params = enc.init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (4, 3200))

    ref = np.asarray(enc.apply(params, wav))

    mesh = make_mesh_2d(4, 2)
    specs = wav2vec2_partition_specs(params)
    sharded_params = shard_tree(mesh, params, specs)
    wav_s = jax.device_put(wav, NamedSharding(mesh, P("data")))
    with mesh:
        out = jax.jit(enc.apply)(sharded_params, wav_s)
    got = np.asarray(out)

    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-4

    # the layer tensors really are split over the model axis
    qw = sharded_params["layers"]["q_w"]
    assert qw.sharding.spec == P(None, None, "model")


def test_validate_tp_rejects_odd_split():
    from mlvae_tpu.modules.wav2vec2 import Wav2Vec2Encoder
    from mlvae_tpu.parallel.tp import validate_tp

    enc = Wav2Vec2Encoder(source="", output_size=64)  # 2 heads
    msg = validate_tp(enc, 3)
    assert msg is not None and "divisible" in msg


def test_dryrun_dp_tp_runs():
    import __graft_entry__ as ge

    ge._dryrun_dp_tp(n_data=2, n_model=2)


def test_w2v_recipe_trains_with_tensor_parallel(tmp_path):
    """--tensor_parallel 2 on the w2v_LSTM_FC recipe: 2-D (data=4, model=2)
    mesh, wav2vec2 trunk tensor-split via its partition_specs hook, one
    training epoch end to end through the CLI."""
    import os
    from mlvae_tpu.cli import train as train_cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_cli.main([
            f"{repo}/config/run.yaml",
            "--dataset", "SynAudioMNIST", "--language", "digits",
            "--n_phonemes", "12", "--model_class", "w2v_LSTM_FC",
            "--model_name", "tp_smoke",
            "--model", f"!include:{repo}/mlvae_tpu/models/w2v_LSTM_FC/model.yaml",
            "--extra_overrides",
            "{model: {n_epochs: 1, wav2vec2_size: 64}}",
            "--data_parallel", "--tensor_parallel", "2",
            "--debug", "--debug_batches", "1",
        ])
        log = (tmp_path / "results/tp_smoke/train_log.txt").read_text()
        assert "loss" in log
    finally:
        os.chdir(old)
