"""Dense layers and simple activations.

Initialization follows the same distribution family as the reference's torch
defaults (U(+-1/sqrt(fan_in)) for ``nn.Linear``) so randomly-initialized
training dynamics are comparable; exact values differ (different PRNG).
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, uniform_init


def leaky_relu(x, negative_slope: float = 0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def softplus(x):
    return jax.nn.softplus(x)


class LeakyReLU(Module):
    """Stateless activation module (YAML-visible alias of torch.nn.LeakyReLU)."""

    def __init__(self, negative_slope: float = 0.01):
        super().__init__()
        self.negative_slope = negative_slope

    def init(self, rng):
        return {}

    def apply(self, params, x, **kwargs):
        return leaky_relu(x, self.negative_slope)


class Softplus(Module):
    def __init__(self):
        super().__init__()

    def init(self, rng):
        return {}

    def apply(self, params, x, **kwargs):
        return softplus(x)


class Identity(Module):
    def init(self, rng):
        return {}

    def apply(self, params, x, **kwargs):
        return x


class Linear(Module):
    """y = x @ W^T + b with torch-style U(+-1/sqrt(fan_in)) init.

    The weight is stored as (out, in) to allow 1:1 state-dict exchange with
    torch in parity tests; the forward contraction is expressed so XLA maps it
    onto the MXU regardless of leading batch/time dims.
    """

    def __init__(self, in_size: int, out_size: int, bias: bool = True):
        super().__init__()
        self.in_size = int(in_size)
        self.out_size = int(out_size)
        self.bias = bool(bias)

    def init(self, rng):
        wk, bk = jax.random.split(rng)
        bound = 1.0 / math.sqrt(self.in_size)
        params = {"weight": uniform_init(wk, (self.out_size, self.in_size), bound)}
        if self.bias:
            params["bias"] = uniform_init(bk, (self.out_size,), bound)
        return params

    def apply(self, params, x, **kwargs):
        y = jnp.einsum(
            "...i,oi->...o",
            x,
            params["weight"],
            preferred_element_type=x.dtype,
        )
        if self.bias:
            y = y + params["bias"]
        return y


class Sequential(Module):
    """Ordered composition of modules."""

    def __init__(self, *modules: Module):
        super().__init__()
        self.modules = list(modules)
        for i, m in enumerate(self.modules):
            self.child(str(i), m)

    def init(self, rng):
        return {
            str(i): m.init(jax.random.fold_in(rng, i))
            for i, m in enumerate(self.modules)
        }

    def apply(self, params, x, rng=None, train: bool = False, **kwargs):
        # ensure ONE stream here: handing the same raw key to every child
        # would give stochastic children bitwise-identical randomness
        from mlvae_tpu.nn.core import RngStream
        stream = RngStream.ensure(rng) if rng is not None else None
        for i, m in enumerate(self.modules):
            x = m.apply(params[str(i)], x, rng=stream, train=train)
        return x


def dropout(rng: Optional[jax.Array], x, rate: float, train: bool):
    """Inverted dropout matching torch semantics (scale by 1/(1-p) at train)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
