"""Optimizer factories (YAML aliases of ``torch.optim.*``).

Reference recipes declare optimizers as partials
(``!name:torch.optim.Adam {lr: ...}``, e.g. ``models/MD_VAE/model.yaml:127``)
that the Brain later binds to module parameters
(``models/md_model.py:20-52``).  Here the factory yields an optax
``GradientTransformation`` with the learning rate injected as a runtime
hyperparameter so schedulers can update it without recompiling the step.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _scale_by_adam_moment_dtype(b1: float, b2: float, eps: float,
                                dtype) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored in ``dtype``
    (optax's ``mu_dtype`` covers only the first moment).  The update math
    runs in the grads' dtype (f32 masters); only the resident state is
    cast.  At wav2vec2 scale (317M params) bf16 moments halve the ~3.5 GiB
    f32 Adam residency — the single-chip companion to ZeRO-1
    (parallel/zero1.py), enabled via MLVAE_OPT_MOMENT_DTYPE=bfloat16."""
    dtype = jnp.dtype(dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda g, m: b1 * m.astype(g.dtype) + (1 - b1) * g,
            updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: b2 * v.astype(g.dtype) + (1 - b2) * (g * g),
            updates, state.nu)
        count = jnp.where(state.count < jnp.iinfo(jnp.int32).max,
                          state.count + 1, state.count)
        c1 = 1.0 - jnp.power(jnp.float32(b1), count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(jnp.float32(b2), count.astype(jnp.float32))
        out = jax.tree_util.tree_map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu, nu)
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda x: x.astype(dtype), t)
        return out, optax.ScaleByAdamState(count=count, mu=cast(mu),
                                           nu=cast(nu))

    return optax.GradientTransformation(init, update)


def _adam_moment_dtype(learning_rate, b1, b2, eps, dtype):
    return optax.chain(
        _scale_by_adam_moment_dtype(b1, b2, eps, dtype),
        optax.scale_by_learning_rate(learning_rate),
    )


class OptimizerFactory:
    """Callable spec: ``factory()`` or ``factory(params)`` builds the optax
    transformation.  Mirrors the partial-application pattern of the
    reference YAMLs."""

    def __init__(self, name: str, lr: float, **kwargs):
        self.name = name
        self.lr = float(lr)
        self.kwargs = kwargs

    def make(self) -> optax.GradientTransformation:
        if self.name == "adam":
            betas = self.kwargs.get("betas", (0.9, 0.999))
            eps = self.kwargs.get("eps", 1e-8)
            moment_dtype = self.kwargs.get(
                "moment_dtype",
                os.environ.get("MLVAE_OPT_MOMENT_DTYPE", "").strip() or None)
            if moment_dtype and jnp.dtype(moment_dtype) != jnp.float32:
                opt = optax.inject_hyperparams(_adam_moment_dtype)(
                    learning_rate=self.lr, b1=betas[0], b2=betas[1],
                    eps=eps, dtype=moment_dtype
                )
            else:
                opt = optax.inject_hyperparams(optax.adam)(
                    learning_rate=self.lr, b1=betas[0], b2=betas[1], eps=eps
                )
        elif self.name == "adadelta":
            rho = self.kwargs.get("rho", 0.9)
            eps = self.kwargs.get("eps", 1e-6)
            opt = optax.inject_hyperparams(optax.adadelta)(
                learning_rate=self.lr, rho=rho, eps=eps
            )
        elif self.name == "sgd":
            momentum = self.kwargs.get("momentum", 0.0)
            opt = optax.inject_hyperparams(optax.sgd)(
                learning_rate=self.lr, momentum=momentum or None
            )
        else:
            raise ValueError(f"unknown optimizer: {self.name}")
        return opt

    def __call__(self, *args, **kwargs):
        # reference code calls the partial with parameters; our params are
        # bound later by the Brain, so this returns self
        return self

    def __repr__(self):
        return f"OptimizerFactory({self.name}, lr={self.lr}, {self.kwargs})"


def Adam(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8, **kw):
    return OptimizerFactory("adam", lr, betas=tuple(betas), eps=eps)


def Adadelta(lr: float = 1.0, rho: float = 0.9, eps: float = 1e-6, **kw):
    return OptimizerFactory("adadelta", lr, rho=rho, eps=eps)


def SGD(lr: float = 1e-2, momentum: float = 0.0, **kw):
    return OptimizerFactory("sgd", lr, momentum=momentum)


def as_factory(obj) -> OptimizerFactory:
    """Normalize YAML-built optimizer specs: ``!name:`` tags yield a
    functools.partial of the factory function — call it through."""
    if hasattr(obj, "make"):
        return obj
    out = obj()
    if hasattr(out, "make"):
        return out
    raise TypeError(f"not an optimizer factory: {obj!r}")


def set_learning_rate(opt_state, new_lr: float):
    """Update the injected learning-rate hyperparameter in-place-style.

    ``Brain.opt_states[name]`` is a dict of one InjectHyperparamsState PER
    MODULE (frozen-branch parity); a bare state is accepted too."""
    if isinstance(opt_state, dict):
        for st in opt_state.values():
            st.hyperparams["learning_rate"] = new_lr
    else:
        opt_state.hyperparams["learning_rate"] = new_lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    if isinstance(opt_state, dict):
        lrs = {float(st.hyperparams["learning_rate"])
               for st in opt_state.values()}
        if len(lrs) != 1:
            raise ValueError(f"per-module learning rates diverged: {lrs}")
        return lrs.pop()
    return float(opt_state.hyperparams["learning_rate"])
