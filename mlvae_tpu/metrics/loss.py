"""Scalar loss accumulation (parity with reference
``utils/metric_stats/loss_metric_stats.py``)."""
from __future__ import annotations

from typing import Optional

import numpy as np


class LossMetricStats:
    def __init__(self, name: str):
        self.name = name
        self.clear()

    def clear(self):
        self.loss_list = []

    def append(self, loss):
        # keep device scalars as-is: converting here would force a host
        # sync per batch; summarize() converts once per stage
        self.loss_list.append(loss)

    def summarize(self, field: Optional[str] = None):
        if field is not None:
            raise ValueError("field must be None")
        if not self.loss_list:
            raise ValueError(f"no values appended for {self.name}")
        return {"loss": float(np.mean([float(np.asarray(l))
                                       for l in self.loss_list]))}

    def write_stats(self, f):
        f.write(f"{self.name}: {self.summarize()}\n")
