"""Tracing and per-step timing.

The reference has no profiling subsystem (SURVEY §5: a wall-time print in
the decoder and CUDA memory logging in debug mode).  Here it is
first-class:

* :class:`StepTimer` — cheap wall-clock accounting of every train step with
  p50/p90 summaries and utterance-seconds/sec throughput;
* :func:`trace` — a ``jax.profiler`` trace window (XLA + host timeline,
  viewable in TensorBoard/Perfetto), enabled with ``--profile`` on any
  entry point.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


class StepTimer:
    def __init__(self, hop_seconds: float = 0.02):
        self.hop_seconds = hop_seconds
        self.reset()

    def reset(self):
        self.durations: List[float] = []
        self.utt_seconds: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, batch_frames: Optional[int] = None):
        if self._t0 is None:
            return
        self.durations.append(time.perf_counter() - self._t0)
        if batch_frames is not None:
            self.utt_seconds.append(batch_frames * self.hop_seconds)
        self._t0 = None

    def summarize(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        # skip the first step (compile)
        durs = np.asarray(self.durations[1:] or self.durations)
        out = {
            "steps": len(self.durations),
            "mean_s": float(durs.mean()),
            "p50_s": float(np.percentile(durs, 50)),
            "p90_s": float(np.percentile(durs, 90)),
            "compile_s": float(self.durations[0]),
        }
        if self.utt_seconds:
            total_audio = float(np.sum(self.utt_seconds[1:] or
                                       self.utt_seconds))
            out["utt_sec_per_sec"] = total_audio / max(float(durs.sum()),
                                                       1e-9)
        return out

    def write(self, path):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(self.summarize()) + "\n")


@contextlib.contextmanager
def trace(log_dir, enabled: bool = True):
    """jax.profiler trace window; no-op when disabled."""
    if not enabled:
        yield
        return
    import jax
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    logger.info("profiler trace -> %s", log_dir)
    with jax.profiler.trace(log_dir):
        yield
