"""Reference-YAML compatibility: the ACTUAL recipe YAMLs from the reference
repo (when mounted) must load unmodified through our config kernel, with
every torch/speechbrain class name resolving to its TPU module and all
shared refs aliasing (SURVEY §7 step 1).  Skipped when the reference isn't
mounted."""
from pathlib import Path

import pytest

from mlvae_tpu.hyperyaml import load_hyperyaml

REF = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference repo not mounted")

INJECT = {
    "dataset_name": "SynAudioMNIST",
    "model_name": "compat",
    "output_dir": "/tmp/compat",
    "input_size": 120,
    "n_phonemes": 12,
    "batch_size": 8,
}


def _load(path, extra=None):
    inject = dict(INJECT)
    inject.update(extra or {})
    with open(path) as f:
        return load_hyperyaml(f, overrides=inject, overrides_must_match=False)


def test_reference_md_vae_yaml_loads():
    h = _load(REF / "models/MD_VAE/model.yaml")
    from mlvae_tpu.modules.fc_block import FCBlock
    from mlvae_tpu.modules.h_vae import HierarchicalVAE
    from mlvae_tpu.nn.rnn import LSTM
    from mlvae_tpu.training.checkpointer import Checkpointer

    assert len(h["modules"]) == 9
    assert isinstance(h["modules"]["feat_fc"], FCBlock)
    assert isinstance(h["modules"]["encoder"], HierarchicalVAE)
    assert isinstance(h["modules"]["rnn"], LSTM)
    assert isinstance(h["checkpointer"], Checkpointer)
    # shared-object refs: the same spec everywhere
    assert h["modules"]["encoder"] is h["encoder"]
    assert h["checkpointer"].recoverables["encoder"] is h["encoder"]
    # arithmetic refs resolved (n_phonemes + 2)
    assert h["phoneme_recognizer"].fc.fc_sizes[-1] == 14
    assert h["max_key"] == "plvl_md.F1"


def test_reference_crdnn_ctc_yaml_loads():
    h = _load(REF / "models/CRDNN_CTC/model.yaml")
    from mlvae_tpu.modules.crdnn import CRDNN
    from mlvae_tpu.nn.sb_compat import SBLinear, Softmax
    from mlvae_tpu.training.schedulers import NewBobScheduler

    assert isinstance(h["crdnn"], CRDNN)
    assert h["crdnn"].cnn_channels == (128, 256)  # implicit tuple
    assert isinstance(h["output"], SBLinear)
    assert isinstance(h["log_softmax"], Softmax) and h["log_softmax"].apply_log
    assert isinstance(h["scheduler"], NewBobScheduler)
    # !name: partial of the optimizer factory
    opt = h["optimizer"]()
    assert opt.name == "adadelta" and opt.lr == 1.0


def test_reference_run_yaml_with_include():
    """The full CLI composition: run.yaml + --model !include:<recipe>."""
    from mlvae_tpu.hyperyaml.loader import _parse_tagged

    overrides = _parse_tagged(
        "dataset: SynAudioMNIST\n"
        "language: digits\n"
        "n_phonemes: 12\n"
        "model_class: MD_VAE\n"
        "model_name: compat\n"
        f"model: !include:{REF / 'models/MD_VAE/model.yaml'}\n"
    )
    with open(REF / "config/run.yaml") as f:
        h = load_hyperyaml(f, overrides=overrides)
    assert h["model"]["modules"]["encoder"] is h["model"]["encoder"]
    # outer keys injected into the included recipe
    assert h["model"]["n_phonemes"] == 12
    assert h["model"]["input_size"] == 120
    # the seed side channel ran
    from mlvae_tpu.utils.seed import get_seed
    assert get_seed() == 123456


def test_all_reference_recipe_yamls_load():
    """Every reference recipe YAML materializes through the registry."""
    skip_keys = {"phn_recog_outs_path": "x.pkl"}
    failures = []
    for yml in sorted((REF / "models").glob("*/model.yaml")):
        try:
            _load(yml, extra=skip_keys)
        except Exception as e:  # noqa
            failures.append((yml.parent.name, repr(e)[:120]))
    assert not failures, failures
