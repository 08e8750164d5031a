"""MLP block of Linear+LeakyReLU pairs.

Capability parity with reference ``modules/fc_block.py:4-21``: hidden layers
get LeakyReLU, the last Linear gets one only when ``end_activation=True``.
The reference accepts a ``dropout`` arg it never uses; kept for YAML
compatibility (and likewise unused).
"""
from __future__ import annotations

from typing import Sequence

from mlvae_tpu.nn.core import Module
from mlvae_tpu.nn.layers import Linear, leaky_relu


class FCBlock(Module):
    def __init__(self, fc_sizes: Sequence[int], dropout: float = 0.15,
                 end_activation: bool = False):
        super().__init__()
        self.fc_sizes = [int(s) for s in fc_sizes]
        if len(self.fc_sizes) < 2:
            # the reference's nn.Linear(fc_sizes[-2], fc_sizes[-1]) raises
            # here too; a silent identity would hide the config typo
            raise ValueError(
                f"fc_sizes needs at least [in, out], got {self.fc_sizes}")
        self.dropout = dropout  # accepted-but-unused, like the reference
        self.end_activation = bool(end_activation)
        self.layers = [
            self.child(f"lin{i}", Linear(self.fc_sizes[i], self.fc_sizes[i + 1]))
            for i in range(len(self.fc_sizes) - 1)
        ]

    # init is inherited from Module (fold_in per child in insertion order —
    # byte-identical to the previous local override)

    def apply(self, params, x, rng=None, train: bool = False, **kwargs):
        n = len(self.layers)
        for i, layer in enumerate(self.layers):
            x = layer.apply(params[f"lin{i}"], x)
            if i < n - 1 or self.end_activation:
                x = leaky_relu(x)
        return x
