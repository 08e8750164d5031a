"""Device mesh + sharding helpers for data-parallel training.

The reference never actually scales out (SpeechBrain DDP plumbing exists but
is unused, reference ``prepare_experiment.py:12,55``; SURVEY §2.6).  Here DP
is first-class and TPU-native: one ``jax.sharding.Mesh`` over all chips, the
batch sharded along the ``data`` axis, parameters/optimizer state
replicated, and XLA inserting the gradient ``psum`` over ICI inside the one
fused train step.  The MD models (~10-30M params) need no parameter
sharding (SURVEY §5); the one exception is the wav2vec2-large trunk, which
gets tensor parallelism in :mod:`mlvae_tpu.parallel.tp`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, dev_batch):
    """Place a device-batch dict ((array, lens) pairs) with the batch axis
    sharded across the mesh.  Batch size must divide the mesh size (the
    DataLoader pads batches up when DP is enabled)."""
    bs = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, bs), dev_batch
    )


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
