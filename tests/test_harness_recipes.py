"""Smoke-run every module-isolation harness recipe (reference test strategy,
SURVEY §4 item 2) through the real train entry on the synthetic corpus."""
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

RECIPES = [
    ("test_gmm_vae", "min_key"),
    ("test_h_vae", "min_key"),
    ("test_phn_classifier", "max_key"),
    ("test_b_ind_classifier", "max_key"),
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("harness_wd")
    old = os.getcwd()
    os.chdir(wd)
    yield wd
    os.chdir(old)


@pytest.mark.filterwarnings("error:.*use 1 as default.*")
@pytest.mark.parametrize("recipe,key_kind", RECIPES)
def test_harness_recipe_smoke(workdir, recipe, key_kind):
    from conftest import explicit_default_weights

    from mlvae_tpu.cli import train as train_cli

    model_yaml = REPO / f"mlvae_tpu/models/{recipe}/model.yaml"
    # explicit reference-default weights: exercise the real weighting path,
    # not the "use 1 as default" warning fallback (VERDICT r2 item 6)
    weights = explicit_default_weights(model_yaml)
    overrides = ("{model: {n_epochs: 1, %s}}" % weights
                 if weights else "{model: {n_epochs: 1}}")
    args = [
        str(REPO / "config/run.yaml"),
        "--dataset", "SynAudioMNIST",
        "--language", "digits",
        "--n_phonemes", "12",
        "--model_class", recipe,
        "--model_name", f"{recipe}_smoke",
        "--model", f"!include:{model_yaml}",
        "--extra_overrides", overrides,
        "--debug", "--debug_batches", "1",
    ]
    model = train_cli.main(args)
    out_dir = workdir / f"results/{recipe}_smoke"
    assert (out_dir / "train_log.txt").exists()
    assert len(list((out_dir / "checkpoints").iterdir())) >= 1
