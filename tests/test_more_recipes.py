"""Smoke tests: LSTM_FC and HMM_DNN_ALI recipes + HMM aligner math."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parent.parent


def test_hmm_aligner_forward_matches_bruteforce():
    """Forward score on a tiny problem vs explicit path enumeration."""
    from mlvae_tpu.modules.hmm_aligner import HMMAligner

    aligner = HMMAligner(states_per_phoneme=1, batch_reduction="none",
                         input_len_norm=False)
    rs = np.random.RandomState(0)
    T, K = 4, 3
    pout = np.log(rs.dirichlet(np.ones(K), size=(1, T))).astype(np.float32)
    states = np.asarray([[0, 2]])  # two 1-state phonemes
    score = np.asarray(aligner.forward_score(
        jnp.asarray(pout), jnp.asarray([1.0]), jnp.asarray(states),
        jnp.asarray([1.0]),
    )).reshape(-1)[0]

    # enumerate all monotonic paths through states [0, 2] over 4 frames:
    # switch point can be after frame 1, 2, or 3
    total = -np.inf
    lp = pout[0]
    for switch in range(1, T):
        p = sum(lp[t, 0] for t in range(switch)) + \
            sum(lp[t, 2] for t in range(switch, T))
        total = np.logaddexp(total, p)
    assert abs(score - total) < 1e-4


def test_hmm_aligner_viterbi_monotonic():
    from mlvae_tpu.modules.hmm_aligner import HMMAligner

    aligner = HMMAligner(states_per_phoneme=3)
    rs = np.random.RandomState(1)
    B, T, K = 2, 30, 12
    pout = np.log(rs.dirichlet(np.ones(K), size=(B, T))).astype(np.float32)
    phns = np.asarray([[1, 2], [3, 0]])
    states = np.asarray(aligner.expand_phns_by_states_per_phoneme(
        phns, np.asarray([1.0, 0.5])
    ))
    _, alis = aligner.viterbi(pout, np.asarray([1.0, 0.8]), states,
                              np.asarray([1.0, 0.5]))
    ali = alis[0]
    assert len(ali) == T
    # path is monotonic within the expanded state sequence
    order = {int(s): i for i, s in enumerate(states[0])}
    idx = [order[int(s)] for s in ali]
    assert idx == sorted(idx)
    assert idx[0] == 0 and idx[-1] == len(states[0]) - 1


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("more_wd")
    old = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(old)


@pytest.mark.parametrize("recipe", ["LSTM_FC", "HMM_DNN_ALI"])
def test_recipe_smoke(workdir, recipe):
    from mlvae_tpu.cli import train as train_cli

    model_yaml = REPO / f"mlvae_tpu/models/{recipe}/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", recipe,
        "--model_name", f"{recipe}_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides", "{model: {n_epochs: 1}}",
        "--debug", "--debug_batches", "1",
    ]
    train_cli.main(args)
    log = (workdir / f"results/{recipe}_smoke/train_log.txt").read_text()
    assert "loss" in log


def test_hmm_evaluate_recalls_newest_on_absent_key(workdir):
    """ADVICE r2 (high): HMM_DNN_ALI selects on ``max_key: flvl_md.F1``, a
    metric the recipe never emits.  evaluate() must fall back to the newest
    REAL checkpoint (with a loud warning) instead of silently scoring
    freshly-initialized weights.  Runs after test_recipe_smoke's training."""
    import warnings as _warnings

    from mlvae_tpu.cli import test as test_cli

    ckpt_dir = workdir / "results/HMM_DNN_ALI_smoke/checkpoints"
    assert ckpt_dir.exists() and list(ckpt_dir.iterdir())

    model_yaml = REPO / "mlvae_tpu/models/HMM_DNN_ALI/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "HMM_DNN_ALI",
        "--model_name", "HMM_DNN_ALI_smoke",
        "--model", f"!include:{model_yaml}",
        "--debug", "--debug_batches", "1",
    ]
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        model = test_cli.main(args)
    assert any("falling back to the newest checkpoint" in str(w.message)
               for w in caught), [str(w.message) for w in caught]

    # the recalled params must be the TRAINED ones, not a fresh init: a
    # fresh build from the same yaml seeds differently-updated weights
    from mlvae_tpu.training.checkpointer import Checkpointer
    ck = Checkpointer(ckpt_dir)
    newest = ck.find_checkpoint()
    restored = ck.load_checkpoint(newest, {"params": model.params})
    a = jax.tree_util.tree_leaves(model.params)
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hmm_viterbi_realign_during_train(workdir):
    """`realign_during_train: True` restores the reference schedule: the
    viterbi objective refreshes stored alignments from every TRAIN batch
    (reference HMM_DNN_ALI/model.py:81-89)."""
    from mlvae_tpu.cli import train as train_cli

    model_yaml = REPO / "mlvae_tpu/models/HMM_DNN_ALI/model.yaml"
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", "HMM_DNN_ALI",
        "--model_name", "hmm_viterbi_realign",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides",
        "{model: {n_epochs: 1, init_training_type: viterbi, "
        "switch_training_type: viterbi, realign_during_train: True}}",
        "--debug", "--debug_batches", "2",
    ]
    model = train_cli.main(args)
    # train-batch utterances must now be in the aligner store (the default
    # schedule only stores VALID/TEST utterances)
    aligner = model.hparams["aligner"]
    assert len(aligner.align_dict) > 0
    # train accuracy was appended (reference parity: accuracy at every stage)
    log = (workdir / "results/hmm_viterbi_realign/train_log.txt").read_text()
    train_lines = [l for l in log.splitlines()
                   if "stage: train" in l and "accuracy.average" in l]
    assert train_lines and "accuracy.average: 0.0," not in train_lines[-1]
