"""MD_VAE flagship recipe end-to-end: target cycling, in-step device decode,
MD/boundary metrics, checkpoint-on-F1, saved-MD-results round trip."""
import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _args(n_epochs=3, extra=""):
    from conftest import explicit_default_weights

    model_yaml = REPO / "mlvae_tpu/models/MD_VAE/model.yaml"
    weights = explicit_default_weights(model_yaml)
    return [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "MD_VAE",
        "--model_name", "mdvae_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: %d, %s}}" % (n_epochs, weights),
        "--debug", "--debug_batches", "2",
    ]


def test_md_vae_train_eval_roundtrip(workdir):
    from mlvae_tpu.cli import train as train_cli
    from mlvae_tpu.cli import test as test_cli
    from mlvae_tpu.models.MD_VAE.model import Target

    # 3 epochs covers the full PHN_RECOG -> B_DETECTOR -> VAE target cycle;
    # the VAE epoch triggers evaluation + checkpointing on plvl_md.F1
    model = train_cli.main(_args(n_epochs=3))
    assert model.target == Target.VAE
    out_dir = workdir / "results/mdvae_smoke"
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert len(ckpts) >= 1
    meta = json.loads((ckpts[0] / "meta.json").read_text())
    assert "plvl_md.F1" in meta

    log_text = (out_dir / "train_log.txt").read_text()
    assert "pi_nll_loss" in log_text
    assert "plvl_md.F1" in log_text

    # TEST: metrics written + saved MD results json for the cleaning loop
    test_cli.main(_args())
    metrics_text = (out_dir / "test_output/test_metrics.txt").read_text()
    assert "plvl_md.F1" in metrics_text
    saved = workdir / "datasets/SynAudioMNIST/saved_md_results/mdvae_smoke.json"
    assert saved.exists()
    md_results = json.loads(saved.read_text())
    assert len(md_results) > 0
    for utt_results in md_results.values():
        for idx, start_pct, end_pct in utt_results:
            assert 0 <= start_pct < end_pct <= 1

    # round trip: apply saved MD results as data cleaning in a new run.
    # A 3-epoch debug model may flag nothing, so craft a deterministic flag
    # for one utterance (phoneme 1, frames 25%-50%) and verify the cleaner
    # excises it everywhere.
    from mlvae_tpu.cli.experiment import prepare_experiment
    base = prepare_experiment(_args(), prepare_exp_dir=False)["datasets"][2]
    utt_id = base.ids[0]
    crafted = {u: [] for u in md_results}
    crafted[utt_id] = [[1, 0.25, 0.5]]
    saved.write_text(json.dumps(crafted))

    args = _args() + ["--saved_md_results_model_name", "mdvae_smoke"]
    # the crafted dump covers TEST utterances only, so the train/valid
    # splits legitimately hit the zero-coverage cleaning warning
    with pytest.warns(UserWarning, match=r"cover 0/\d+ utterances"):
        ds_clean = prepare_experiment(
            args, prepare_exp_dir=False)["datasets"][2]
    n_before_p = len(base.data[utt_id]["gt_phn_seq"])
    n_after_p = len(ds_clean.data[utt_id]["gt_phn_seq"])
    assert n_after_p == n_before_p - 1
    # feat drops exactly the fa-boundary span of the flagged phoneme (NOT
    # the saved pcts — see the deviation note in data_io.py), so every
    # frame-level key stays consistent with the alignment the retrain uses
    import numpy as np
    fa_before = np.asarray(base.data[utt_id]["fa_boundary_seq"])
    starts = np.flatnonzero(fa_before == 1).tolist() + [len(fa_before)]
    span = starts[2] - starts[1]  # flagged phoneme idx 1
    n_before_f = len(base.data[utt_id]["feat"])
    clean = ds_clean.data[utt_id]
    assert len(clean["feat"]) == n_before_f - span
    # retrain invariants (reference phoneme_recognizer.py:64-68): one
    # boundary marker per remaining phoneme; spans partition the frames
    fa_after = np.asarray(clean["fa_boundary_seq"])
    assert len(fa_after) == len(clean["feat"]) == len(clean["flvl_gt_phn_seq"])
    assert int((fa_after == 1).sum()) == n_after_p
    # gt_boundary_seq cleans against the SAME frame set (marker remap), so
    # it too keeps the cleaned feat length and the plvl marker count —
    # eval-time boundary_md_scoring compares it against a decoded boundary
    # seq of exactly len(feat) frames
    gt_after = np.asarray(clean["gt_boundary_seq"])
    assert len(gt_after) == len(clean["feat"])
    assert int((gt_after == 1).sum()) == n_after_p


def test_frozen_branches_do_not_drift():
    """Reference parity for target cycling: on an epoch where a branch's
    losses are detached, that branch's params AND optimizer state must stay
    bit-identical (torch skips grad=None params entirely; adam momentum
    tails must not keep moving them)."""
    import jax
    import jax.numpy as jnp
    from mlvae_tpu.bench_utils import build_md_vae, synth_batch
    from mlvae_tpu.models.MD_VAE.model import Target
    from mlvae_tpu.training.brain import Stage

    model = build_md_vae(batch_size=2)
    model.init_params()
    batch = synth_batch(batch_size=2, T=32, L=4)
    model.ensure_states(int(batch["feat"][0].shape[-1]))
    model.init_optimizers()

    # epoch 1: PHN_RECOG target builds real adam momentum on the recognizer
    model.target = Target.PHN_RECOG
    step = model._get_compiled("train", Stage.TRAIN)
    p, o, s, loss, _ = step(model.params, model.opt_states, model.states,
                            jax.random.PRNGKey(1), batch,
                            jnp.asarray(1, jnp.int32))

    # epoch 2: B_DETECTOR target -> recognizer losses detached; with live
    # momentum the old zero-grad update would keep moving its params
    model.target = Target.B_DETECTOR
    step = model._get_compiled("train", Stage.TRAIN)
    params0 = jax.device_get(p)
    opt0 = jax.device_get(o)
    p, o, s, loss, _ = step(p, o, s, jax.random.PRNGKey(2), batch,
                            jnp.asarray(2, jnp.int32))
    p2, o2, *_ = step(p, o, s, jax.random.PRNGKey(3), batch,
                      jnp.asarray(2, jnp.int32))
    p2, o2 = jax.device_get(p2), jax.device_get(o2)

    # the recognizer itself: trained (momentum primed) in epoch 1, then
    # loss-detached in epoch 2 — the exact reference freeze semantics
    frozen = ["phoneme_recognizer"]
    for k in frozen:
        for a, b in zip(jax.tree_util.tree_leaves(params0[k]),
                        jax.tree_util.tree_leaves(p2[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"frozen param drifted: {k}")
    # frozen modules' optimizer state is untouched too
    for name, per_mod in opt0.items():
        for mk in per_mod:
            if mk in frozen:
                for a, b in zip(jax.tree_util.tree_leaves(per_mod[mk]),
                                jax.tree_util.tree_leaves(o2[name][mk])):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b),
                        err_msg=f"frozen opt state advanced: {name}/{mk}")
    # and the boundary detector DID train
    bd = [k for k in model.params if "b_detector" in k or "boundary" in k]
    assert any(
        np.abs(np.asarray(x) - np.asarray(y)).max() > 0
        for k in bd
        for x, y in zip(jax.tree_util.tree_leaves(params0[k]),
                        jax.tree_util.tree_leaves(p2[k]))
    ), "active branch should have updated"
