"""Shared recipe base: multi-optimizer setup, loss bookkeeping with KLD
annealing, metric logging, and metric-keyed checkpointing.

Capability parity with reference ``models/md_model.py`` (class ``MDModel``):

* multi-optimizer init with per-module param groups (``md_model.py:20-52``)
  — expressed as grad-subtree routing, one optax state per optimizer;
* loss-stat bookkeeping per ``hparams.metric_keys`` (``:100-112``);
* weighted total loss with KLD weight annealing by train-set size
  (``:189-213``; the reference hard-codes ``n_samples = 2249`` at ``:199``,
  configurable here via ``hparams.kld_n_samples`` with the same default);
* train logger + scalar (TB/JSONL) logging (``:90-98``, ``:137-148``);
* checkpoint save on VALID with max/min metric keys (``:151-164``);
* TEST metric/stat file dump (``:166-187``).
"""
from __future__ import annotations

import logging
import warnings
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from mlvae_tpu.metrics.loss import LossMetricStats
from mlvae_tpu.training.brain import Brain, Stage
from mlvae_tpu.training.loggers import FileTrainLogger, ScalarWriter

logger = logging.getLogger(__name__)

KLD_N_SAMPLES_DEFAULT = 2249  # reference md_model.py:199 (L2-ARCTIC train)


class MDModel(Brain):
    def __init__(self, label_encoder=None, **kwargs):
        super().__init__(label_encoder=label_encoder, **kwargs)

    # ------------------------------------------------------------------
    # optimizers
    # ------------------------------------------------------------------
    def init_optimizers(self):
        if "optimizers" in self.hparams:
            opt_info = self.hparams["optimizers"]
            if isinstance(opt_info, list):
                opt_info = {f"optimizer_{i}": o for i, o in enumerate(opt_info)}
        elif "optimizer" in self.hparams:
            opt_info = {"optimizer": self.hparams["optimizer"]}
        else:
            raise ValueError("No optimizers defined.")

        self.optimizers = {}
        self.opt_states = {}
        for name, info in opt_info.items():
            if isinstance(info, dict):
                factory = info["opt_class"]
                module_names = list(info.get("modules", [])) or None
            else:
                factory = info
                module_names = None
            from mlvae_tpu.training.optim import as_factory
            opt = as_factory(factory).make()
            self.optimizers[name] = (opt, module_names)
            # per-module states: frozen (detached-loss) modules keep their
            # optimizer state untouched, matching the reference's torch
            # behavior where grad=None params are skipped (md_model.py:54-88)
            self.opt_states[name] = self._init_opt_state(opt, module_names)

    # ------------------------------------------------------------------
    # loss weighting (pure, used inside the jitted step)
    # ------------------------------------------------------------------
    def weighted_total(self, losses: Dict):
        total = 0.0
        for key, value in losses.items():
            weight_key = key.replace("_loss", "_weight")
            weight = self.hparams.get(weight_key, "none")
            if weight == "none":
                warnings.warn(f"{weight_key} not found, use 1 as default")
                weight = 1.0
            if "_kld" in weight_key:
                n_samples = self.hparams.get(
                    "kld_n_samples", KLD_N_SAMPLES_DEFAULT
                )
                weight = weight / (n_samples / self.hparams["batch_size"])
            total = total + weight * value
        return total

    # ------------------------------------------------------------------
    # hooks
    # ------------------------------------------------------------------
    def on_fit_start(self):
        super().on_fit_start()
        out_dir = Path(self.hparams["output_dir"])
        self.train_logger = FileTrainLogger(out_dir / "train_log.txt")
        self.scalar_writer = ScalarWriter(out_dir)
        with open(out_dir / "modules.txt", "w") as f:
            for name, module in self.modules.items():
                f.write(f"{name}: {module!r}\n")
        # resume from the newest checkpoint when present
        if self.checkpointer is not None:
            from mlvae_tpu.training.checkpointer import CheckpointKeyMismatch

            templates = self._checkpoint_templates()
            try:
                restored, ckpt = self.checkpointer.recover_if_possible(
                    templates)
            except CheckpointKeyMismatch as e:
                if not e.rec_name.startswith("opt__"):
                    raise  # params/states layout changed: not resumable
                # optimizer-state layout changed (e.g. the move to
                # one-state-per-module): resume params/states and RESET the
                # optimizer moments rather than crash — loudly, since fresh
                # Adam moments alter the next few steps
                logger.warning(
                    "checkpoint %s predates the current optimizer-state "
                    "layout (%s); resuming with freshly initialized "
                    "optimizer state", self.checkpointer.checkpoints_dir, e)
                templates = {k: v for k, v in templates.items()
                             if not k.startswith("opt__")}
                restored, ckpt = self.checkpointer.recover_if_possible(
                    templates)
            if restored:
                self._restore_state(restored, ckpt)
                # restored trees are host arrays: re-apply TP/DP/ZeRO-1
                # mesh placement (no-op on single-device runs)
                self.place_restored_state()

    def on_stage_start(self, stage: Stage, epoch=None):
        self.stats_loggers = {}
        for key in self.hparams.get("metric_keys", []):
            if key.endswith("_loss"):
                self.stats_loggers[key + "_stats"] = LossMetricStats(key)

    def collect_metrics(self, stage_loss) -> Dict[str, float]:
        log_metrics = {"loss": round(float(stage_loss), 3)}
        for metric_key in self.hparams.get("metric_keys", []):
            parts = metric_key.split(".")
            stats = self.stats_loggers.get(f"{parts[0].lower()}_stats")
            if stats is None:
                continue
            try:
                if len(parts) == 1:
                    for k, v in stats.summarize(None).items():
                        log_metrics[f"{metric_key}.{k}"] = round(float(v), 2)
                else:
                    log_metrics[metric_key] = round(
                        float(stats.summarize(parts[1])), 2
                    )
            except ValueError:
                pass  # no data appended this stage
        return log_metrics

    def on_stage_end(self, stage: Stage, stage_loss, epoch=None):
        stage_name = stage.name.lower()
        if epoch is None:
            epoch = self.current_epoch()
        log_metrics = self.collect_metrics(stage_loss)

        if stage in (Stage.TRAIN, Stage.VALID):
            self.train_logger.log_stats(
                stats_meta={"stage": stage_name, "epoch": epoch},
                **{f"{stage_name}_stats": log_metrics},
            )
            for k, v in log_metrics.items():
                self.scalar_writer.add_scalar(f"{k}/{stage_name}", v,
                                              global_step=epoch)
            if stage == Stage.VALID and self.checkpointer is not None:
                max_keys, min_keys = [], []
                if self.hparams.get("max_key") is not None:
                    max_keys.append(self.hparams["max_key"])
                if self.hparams.get("min_key") is not None:
                    min_keys.append(self.hparams["min_key"])
                if not max_keys and not min_keys:
                    raise ValueError("no max_key or min_key provided")
                meta = dict(log_metrics)
                meta["epoch"] = epoch
                self.checkpointer.save_and_keep_only(
                    self._checkpoint_state(), meta=meta,
                    max_keys=max_keys, min_keys=min_keys,
                )

        if stage == Stage.TEST:
            out_dir = Path(self.hparams["output_dir"]) / "test_output"
            out_dir.mkdir(parents=True, exist_ok=True)
            log_str = ", ".join(f"{k}: {v}" for k, v in log_metrics.items())
            logger.info("Best epoch: %s, %s", epoch, log_str)
            with open(out_dir / "test_metrics.txt", "w") as f:
                f.write(f"Epoch: {epoch}\n")
                values = []
                for k, v in log_metrics.items():
                    f.write(f"{k}: {v}\n")
                    values.append(str(v))
                f.write(f"Epoch: {epoch}\t" + "\t".join(values) + "\n")
            for stats_key, stats in self.stats_loggers.items():
                name = stats_key.replace("_stats", "")
                try:
                    with open(out_dir / f"{name}.txt", "w") as f:
                        stats.write_stats(f)
                except ValueError:
                    pass

    # ------------------------------------------------------------------
    # checkpoint state
    # ------------------------------------------------------------------
    def _checkpoint_state(self):
        state = {"params": self.params, "states": self.states}
        # Persisting optimizer state is an ENHANCEMENT over the reference
        # (its YAML recoverables list modules + epoch_counter only, e.g.
        # MD_VAE/model.yaml:142-154 — SpeechBrain never checkpoints the
        # optimizers, so a reference resume always restarts with fresh
        # Adam moments).  --ckpt_opt_state False opts into the reference's
        # behaviour; at w2v scale it cuts ~3.5 GiB of Adam moments from
        # every snapshot's device->host fetch (~3 min/epoch through the
        # axon tunnel — the dominant epoch cost of the fine-tune recipes).
        if self.run_opts.get("ckpt_opt_state", True):
            for name, s in self.opt_states.items():
                state[f"opt__{name}"] = s
        elif not getattr(self, "_warned_no_opt_ckpt", False):
            self._warned_no_opt_ckpt = True
            logger.warning(
                "--ckpt_opt_state False: optimizer state excluded from "
                "checkpoints (reference-parity mode); a resumed run "
                "restarts with fresh optimizer moments")
        return state

    def _checkpoint_templates(self):
        return self._checkpoint_state()

    def _restore_state(self, restored, ckpt):
        if "params" in restored:
            self.params = restored["params"]
        if restored.get("states"):
            self.states = restored["states"]
        elif (ckpt.path / "states.npz").exists():
            # running states (normalizer stats) are lazily shaped; restore
            # them once ensure_states builds the templates
            self._pending_states_ckpt = ckpt
        for name in self.opt_states:
            key = f"opt__{name}"
            if key in restored:
                self.opt_states[name] = restored[key]
        epoch = ckpt.meta.get("epoch")
        counter = self.hparams.get("epoch_counter")
        if epoch is not None and counter is not None:
            counter.current = int(epoch)
        logger.info("resumed from %s (epoch %s)", ckpt.path, epoch)
