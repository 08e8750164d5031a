"""Optimizer factories (YAML aliases of ``torch.optim.*``).

Reference recipes declare optimizers as partials
(``!name:torch.optim.Adam {lr: ...}``, e.g. ``models/MD_VAE/model.yaml:127``)
that the Brain later binds to module parameters
(``models/md_model.py:20-52``).  Here the factory yields an optax
``GradientTransformation`` with the learning rate injected as a runtime
hyperparameter so schedulers can update it without recompiling the step.
"""
from __future__ import annotations

from typing import Optional

import optax


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
