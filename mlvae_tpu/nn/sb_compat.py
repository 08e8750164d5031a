"""Small SpeechBrain-surface modules used by the CTC recipes
(``!new:speechbrain.nnet.linear.Linear`` and
``!new:speechbrain.nnet.activations.Softmax``)."""
from __future__ import annotations

import jax

from mlvae_tpu.nn.core import Module
from mlvae_tpu.nn.layers import Linear


class SBLinear(Module):
    """Linear with SpeechBrain's constructor surface (input_size/n_neurons)."""

    def __init__(self, input_size: int, n_neurons: int, bias: bool = True,
                 **kwargs):
        super().__init__()
        self.lin = self.child("lin", Linear(input_size, n_neurons, bias))

    def apply(self, params, x, **kwargs):
        return self.lin.apply(params["lin"], x)


class Softmax(Module):
    def __init__(self, apply_log: bool = False, dim: int = -1):
        super().__init__()
        self.apply_log = bool(apply_log)
        self.dim = dim

    def init(self, rng):
        return {}

    def apply(self, params, x, **kwargs):
        if self.apply_log:
            return jax.nn.log_softmax(x, axis=self.dim)
        return jax.nn.softmax(x, axis=self.dim)

    def __call__(self, *args, **kwargs):
        # recipes call hparams.log_softmax(out) directly (stateless)
        if args and not isinstance(args[0], dict):
            return self.apply({}, args[0])
        return super().__call__(*args, **kwargs)
