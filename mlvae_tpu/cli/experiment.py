"""Experiment driver (parity with reference ``prepare_experiment.py``):

parse CLI -> load hyperyaml with overrides + extra_overrides channel ->
create experiment dir -> run dataset prepare by import -> build datasets ->
reflectively instantiate ``models.<model_class>.model.SBModel``.
"""
from __future__ import annotations

import importlib
import logging
import shutil
import time
from pathlib import Path
from typing import Dict, List

from mlvae_tpu.cli.args import parse_arguments
from mlvae_tpu.data.data_io import prepare_datasets
from mlvae_tpu.hyperyaml import load_hyperyaml, recursive_update
from mlvae_tpu.hyperyaml.loader import _parse_tagged

logger = logging.getLogger(__name__)


def _apply_device_opt(run_opts: Dict) -> None:
    """Honor ``--device`` (reference run_opts carry ``device: cuda:0|cpu``,
    consumed by sb.Brain): map it onto the jax platform BEFORE any backend
    initializes.  ``cpu`` forces the CPU backend even when a TPU plugin is
    ambient (the plugin wins over the JAX_PLATFORMS env var alone)."""
    device = str(run_opts.get("device", "") or "").lower()
    if not device:
        return
    import jax

    platform, _, index = device.partition(":")
    if platform in ("cuda", "gpu"):  # reference default naming; jax: 'gpu'
        platform = "gpu"
    if platform in ("cpu", "gpu", "tpu"):
        jax.config.update("jax_platforms", platform)
        logger.info("device run_opt: jax platform forced to %r", platform)
        if index and index != "0":
            # jax picks its default device per process; honoring an index
            # requires CUDA_VISIBLE_DEVICES before backend init
            logger.warning(
                "device index %r is ignored (jax selects the default %s "
                "device); restrict devices with CUDA_VISIBLE_DEVICES=%s",
                index, platform, index)


def prepare_experiment(args: List[str], prepare_exp_dir: bool = True) -> Dict:
    hparams_file, run_opts, overrides_str = parse_arguments(args)
    _apply_device_opt(run_opts)
    if run_opts.get("compile_cache", True):
        from mlvae_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(run_opts.get("compile_cache_dir"))

    overrides = _parse_tagged(overrides_str) if overrides_str else {}
    overrides = overrides or {}
    extra_overrides = overrides.pop("extra_overrides", {}) or {}

    with open(hparams_file) as fin:
        hparams = load_hyperyaml(fin, [extra_overrides, overrides])
    # the extra_overrides channel is re-merged after load so nested recipe
    # values win over YAML-resolved ones (reference prepare_experiment.py:25)
    recursive_update(hparams, extra_overrides, keep_objects=True)

    if prepare_exp_dir and "output_dir" in hparams:
        out_dir = Path(hparams["output_dir"])
        out_dir.mkdir(parents=True, exist_ok=True)
        # save the OVERRIDES-RESOLVED yaml (reference parity: SpeechBrain's
        # create_experiment_directory records the actual run config, not the
        # raw input file — re-running from the saved file must reproduce
        # THIS experiment).  Constructor tags are preserved unmaterialized.
        try:
            from mlvae_tpu.hyperyaml import resolve_references
            with open(hparams_file) as fin:
                resolved = resolve_references(
                    fin, [extra_overrides, overrides])
            (out_dir / "hyperparams.yaml").write_text(resolved.read())
        except Exception:
            logger.exception("could not dump resolved hyperparams; "
                             "copying the raw file instead")
            try:
                shutil.copy(hparams_file, out_dir / "hyperparams.yaml")
            except shutil.SameFileError:
                pass

    prepared = {"hparams": hparams, "run_opts": run_opts}

    t_prep = time.time()
    dataset_name = hparams["dataset"]
    prepare_mod = importlib.import_module(
        f"mlvae_tpu.data.datasets.{dataset_name}.prepare"
    )
    prepare_mod.prepare(**hparams["prepare"])

    datasets, label_encoder = prepare_datasets(hparams)
    prepared["datasets"] = datasets
    prepared["label_encoder"] = label_encoder
    logger.info("dataset prepare+load: %.1fs", time.time() - t_prep)

    if "model_class" in hparams:
        model_class = hparams["model_class"]
        model_mod = importlib.import_module(
            f"mlvae_tpu.models.{model_class}.model"
        )
        model = model_mod.SBModel(
            label_encoder=label_encoder,
            modules=hparams["model"]["modules"],
            hparams=hparams["model"],
            run_opts=run_opts,
            checkpointer=hparams["model"].get("checkpointer"),
        )
        prepared["model"] = model

    return prepared
