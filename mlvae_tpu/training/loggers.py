"""Training logs: file train logger + scalar sink.

Capability parity with the reference's three sinks
(``models/md_model.py:90-98``): python logging, SpeechBrain-style
``FileTrainLogger`` lines in ``train_log.txt``, and per-metric scalar
timeseries.  TensorBoard is used when importable; otherwise scalars land in
a ``scalars.jsonl`` the user can plot directly (zero-dependency default).
"""
from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class FileTrainLogger:
    def __init__(self, save_file):
        self.save_file = Path(save_file)
        self.save_file.parent.mkdir(parents=True, exist_ok=True)

    def _stats_str(self, stats: Dict) -> str:
        return ", ".join(f"{k}: {v}" for k, v in stats.items())

    def log_stats(self, stats_meta: Dict, train_stats: Optional[Dict] = None,
                  valid_stats: Optional[Dict] = None,
                  test_stats: Optional[Dict] = None, **named_stats):
        parts = [self._stats_str(stats_meta)]
        for name, stats in [("train", train_stats), ("valid", valid_stats),
                            ("test", test_stats)] + [
            (k.replace("_stats", ""), v) for k, v in named_stats.items()
        ]:
            if stats:
                parts.append(f"{name}: " + self._stats_str(stats))
        line = " - ".join(parts)
        with open(self.save_file, "a") as f:
            f.write(line + "\n")
        logger.info(line)


class ScalarWriter:
    """TensorBoard SummaryWriter when available, JSONL otherwise."""

    def __init__(self, log_dir):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa
            self._tb = SummaryWriter(log_dir=str(self.log_dir))
        except Exception:
            self._jsonl = open(self.log_dir / "scalars.jsonl", "a")

    def add_scalar(self, tag: str, value, global_step: int = 0):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=global_step)
        else:
            self._jsonl.write(json.dumps({
                "tag": tag, "value": float(value), "step": int(global_step),
                "time": time.time(),
            }) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        elif hasattr(self, "_jsonl"):
            self._jsonl.close()
