"""Tensor-parallel sharding rules for the wav2vec2 transformer trunk.

The reference never shards parameters (its models are 10-30M params and the
SpeechBrain DDP plumbing is unused, reference ``prepare_experiment.py:12,55``).
The one component here that *does* warrant it is the wav2vec2-large encoder
(~300M params, reference ``models/w2v_MD_VAE/model.yaml:13-17``): its
transformer layers get the classic Megatron column/row split over a
``model`` mesh axis, composed with batch sharding over ``data``.

The split is expressed purely as ``PartitionSpec`` placement on the stacked
layer parameters — XLA GSPMD propagates it through the ``lax.scan`` over
layers and inserts one all-reduce per attention/FFN block on ICI:

* q/k/v projections: column-split (heads divide over ``model``)
* attention output projection: row-split (its matmul's contraction is the
  sharded feature dim -> psum)
* FFN in: column-split on the intermediate dim; FFN out: row-split
* layer norms, conv extractor, positional conv: replicated (tiny)

Requires ``num_attention_heads`` and ``intermediate_size`` divisible by the
``model`` axis size.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mlvae_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "model"

# stacked-layer tensors are (L, ...); dim 0 is the scanned layer axis
_W2V_LAYER_RULES = {
    "q_w": P(None, None, MODEL_AXIS), "q_b": P(None, MODEL_AXIS),
    "k_w": P(None, None, MODEL_AXIS), "k_b": P(None, MODEL_AXIS),
    "v_w": P(None, None, MODEL_AXIS), "v_b": P(None, MODEL_AXIS),
    "o_w": P(None, MODEL_AXIS, None), "o_b": P(),
    "ff_in_w": P(None, None, MODEL_AXIS), "ff_in_b": P(None, MODEL_AXIS),
    "ff_out_w": P(None, MODEL_AXIS, None), "ff_out_b": P(),
}


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """A (data, model) mesh; model-axis neighbours should be ICI-adjacent,
    which jax.devices() order gives on TPU slices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"mesh (data={n_data}, model={n_model}) needs "
            f"{n_data * n_model} devices, only {len(devices)} available")
    devices = np.asarray(devices[: n_data * n_model])
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def wav2vec2_partition_specs(params) -> dict:
    """PartitionSpec tree matching a Wav2Vec2Encoder param tree."""

    def spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return _W2V_LAYER_RULES.get(name, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_tree(mesh: Mesh, tree, specs):
    """Place ``tree`` on ``mesh`` leaf-by-leaf according to ``specs``
    (a matching pytree of PartitionSpecs)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def validate_tp(enc, n_model: int) -> Optional[str]:
    """Return an error string if the encoder can't split n_model ways."""
    if enc.num_attention_heads % n_model:
        return (f"num_attention_heads={enc.num_attention_heads} not "
                f"divisible by model axis {n_model}")
    if enc.intermediate_size % n_model:
        return (f"intermediate_size={enc.intermediate_size} not divisible "
                f"by model axis {n_model}")
    return None
