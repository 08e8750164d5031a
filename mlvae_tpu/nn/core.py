"""Functional module core.

A :class:`Module` is a *pure spec*: a cheap Python object holding
hyperparameters only.  Parameters live in an explicit pytree (nested dicts of
``jnp.ndarray``) produced by ``init`` and threaded through ``apply``.  This is
the TPU-native replacement for the reference's ``torch.nn.Module`` instances
constructed at YAML-load time (reference ``hyperpyyaml/core.py:428-444``):
YAML load stays side-effect-free and the whole train step can be traced once
and compiled by XLA.

Conventions
-----------
* ``init(rng) -> params`` — build the parameter pytree.  All shapes come from
  constructor hyperparameters (as in the reference recipes), so no sample
  input is needed.
* ``apply(params, *args, rng=None, train=False) -> outputs`` — pure forward.
  Stochastic modules (VAE sampling, dropout, Gumbel softmax) consume ``rng``.
* Child modules are registered with :meth:`Module.child`; their params nest
  under their name.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


class RngStream:
    """Split-on-demand wrapper around a PRNG key.

    Inside ``jit`` this is pure: each ``next()`` deterministically folds a
    counter into the base key.  Modules that need several independent samples
    per call (e.g. the boundary detector's 10 Kumaraswamy draws) pull from a
    stream instead of hand-threading keys.
    """

    def __init__(self, key: jax.Array):
        self._key = key
        self._count = 0

    def next(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._count)
        self._count += 1
        return k

    @staticmethod
    def ensure(rng) -> "RngStream":
        if rng is None:
            raise ValueError(
                "This module samples at apply time and requires `rng`."
            )
        if isinstance(rng, RngStream):
            return rng
        return RngStream(rng)


class Module:
    """Base class for functional module specs."""

    def __init__(self):
        self._children: Dict[str, "Module"] = {}

    # -- composition -------------------------------------------------------
    def child(self, name: str, module: "Module") -> "Module":
        if not hasattr(self, "_children"):
            self._children = {}
        self._children[name] = module
        return module

    @property
    def children(self) -> Dict[str, "Module"]:
        return dict(getattr(self, "_children", {}))

    # -- parameters --------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Any]:
        """Default init: recursively init registered children.

        CAVEAT: keys fold by registration POSITION, so a conditionally
        registered child shifts every later sibling's init under the same
        seed — register optional children last (or override init) when
        seed-for-seed ablation comparability matters."""
        params: Dict[str, Any] = {}
        for i, (name, child) in enumerate(self.children.items()):
            params[name] = child.init(jax.random.fold_in(rng, i))
        return params

    def apply(self, params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)

    # -- misc ----------------------------------------------------------------
    def param_count(self, params) -> int:
        return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))

    def __repr__(self):
        fields = {
            k: v
            for k, v in self.__dict__.items()
            if not k.startswith("_") and not isinstance(v, Module)
        }
        args = ", ".join(f"{k}={v!r}" for k, v in fields.items())
        return f"{type(self).__name__}({args})"


def uniform_init(rng: jax.Array, shape, bound: float, dtype=jnp.float32):
    """U(-bound, bound), the torch default family for Linear/LSTM weights."""
    return jax.random.uniform(
        rng, shape, minval=-bound, maxval=bound, dtype=dtype
    )
