"""ZeRO-1-style optimizer-state sharding over the data-parallel mesh axis.

The reference has no distributed training at all (SURVEY §2.6: SpeechBrain
DDP plumbing exists but is never configured), so this subsystem has no
reference counterpart — it is the TPU-native answer to optimizer-state
residency at wav2vec2 scale: with a 317M-param trunk, the two f32 Adam
moments (~2.5 GiB) rival the params themselves.  Under data parallelism
every chip holds a full replica of both; ZeRO-1 keeps each chip's moment
shard only:

  * grads arrive replicated (XLA psums them because the batch is sharded);
    a sharding constraint slices them onto the ``data`` axis — on ICI this
    lowers to (a fragment of) a reduce-scatter, not a broadcast;
  * the Adam moment update and the parameter delta are computed on the
    shard (1/N of the elementwise work per chip);
  * one all-gather re-replicates the param DELTA so the replicated params
    stay consistent.

Implemented purely with sharding annotations — ``jax.device_put`` at state
init, ``with_sharding_constraint`` inside the jitted step — so XLA chooses
the collectives ("How to Scale Your Model" recipe; no hand-written
ppermute).  Composes with the Brain's one-optimizer-state-per-module
layout: the wrapper preserves the inner transformation's state structure
(``InjectHyperparamsState`` stays poke-able by ``optim.set_learning_rate``).

Sharding rule: a leaf is sharded along its FIRST dimension divisible by
the ``data`` axis size, else kept replicated (biases of awkward sizes,
scalars like the Adam ``count``).  The rule is shape-based and
deterministic, so init-time placement and in-step constraints always
agree.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec_for(leaf, n: int, axis: str) -> P:
    shape = getattr(leaf, "shape", ())
    for i, d in enumerate(shape):
        if d >= n and d % n == 0:
            return P(*([None] * i + [axis]))
    return P()


def zero1_place(tree, mesh, axis: str = "data"):
    """Device-put every array leaf per the shard rule (init-time twin of
    the in-step constraints)."""
    n = dict(mesh.shape).get(axis, 1)

    def place(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, _spec_for(leaf, n, axis)))

    return jax.tree_util.tree_map(place, tree)


def zero1_wrap(inner: optax.GradientTransformation, mesh,
               axis: str = "data") -> optax.GradientTransformation:
    """Wrap a GradientTransformation so its state lives sharded over the
    ``axis`` mesh dimension and its update math runs on the shards.

    State structure is the inner one (no wrapper state), so checkpointing
    and ``set_learning_rate`` are unaffected.  ``init`` must run OUTSIDE
    jit (it uses device_put); ``update`` must run inside the jitted step.
    """
    n = dict(mesh.shape).get(axis, 1)
    if n <= 1:
        return inner

    def shard(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, _spec_for(x, n, axis)))
            if hasattr(x, "shape") else x, tree)

    def replicate(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P()))
            if hasattr(x, "shape") else x, tree)

    def init(params):
        return zero1_place(inner.init(params), mesh, axis)

    def update(grads, state, params: Optional[dict] = None):
        g = shard(grads)
        p = shard(params) if params is not None else None
        updates, new_state = inner.update(g, state, p)
        # moments stay sharded across steps; the param delta re-replicates
        # (ONE all-gather per module per step)
        return replicate(updates), shard(new_state)

    return optax.GradientTransformation(init, update)


def moment_shard_fraction(opt_state, mesh, axis: str = "data") -> float:
    """Diagnostic: fraction of optimizer-state bytes actually sharded
    (shard bytes / global bytes).  1/n_axis when every leaf sharded."""
    total = got = 0
    for leaf in jax.tree_util.tree_leaves(opt_state):
        nb = getattr(leaf, "nbytes", 0)
        if not nb:
            continue
        total += nb
        sh = getattr(leaf, "sharding", None)
        if sh is not None:
            got += int(np.prod(sh.shard_shape(leaf.shape))) * \
                leaf.dtype.itemsize
        else:
            got += nb
    return got / total if total else 1.0
