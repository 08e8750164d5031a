"""Input normalization with running global statistics.

YAML-visible replacement for SpeechBrain's ``InputNormalization``
(``!new:speechbrain.processing.features.InputNormalization`` in every
recipe, e.g. reference ``models/MD_VAE/model.yaml:6-7``).

Functional design: statistics are explicit state threaded through the train
step, so the whole step stays jittable.  Semantics follow SpeechBrain's
``norm_type: global``: per-utterance masked mean/std are folded into running
averages while training (until ``update_until_epoch``), and every utterance
is normalized by the current global stats.  We fold a whole batch at once
(order-free) instead of SpeechBrain's per-sample sequential update; the
running averages converge to the same values.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mlvae_tpu.nn.core import Module
from mlvae_tpu.utils.tensor import length_mask


class InputNormalization(Module):
    def __init__(
        self,
        mean_norm: bool = True,
        std_norm: bool = True,
        norm_type: str = "global",
        update_until_epoch: int = 3,
    ):
        super().__init__()
        if norm_type not in ("global", "sentence", "batch"):
            raise ValueError(f"unsupported norm_type: {norm_type}")
        self.mean_norm = mean_norm
        self.std_norm = std_norm
        self.norm_type = norm_type
        self.update_until_epoch = update_until_epoch

    def init_state(self, feat_dim: int) -> Dict[str, jnp.ndarray]:
        return {
            "count": jnp.zeros((), jnp.float32),
            "glob_mean": jnp.zeros((feat_dim,), jnp.float32),
            "glob_std": jnp.ones((feat_dim,), jnp.float32),
        }

    def apply(self, state, feats, rel_lens, epoch=1, update: bool = False):
        """Normalize (B, T, C) feats; returns (normed, new_state).

        Statistics are always computed and stored in f32 (AMP hygiene:
        running mean/std are counters, not activations), and the normalized
        output is emitted in the INPUT dtype — under AMP a bf16 feature
        stream stays bf16 here instead of being silently promoted to f32
        by the f32 stats (which would drag every downstream recurrence
        back to f32).
        """
        eps = 1e-10
        in_dtype = feats.dtype
        feats = feats.astype(jnp.float32)
        state = {k: v.astype(jnp.float32) for k, v in state.items()} \
            if self.norm_type == "global" else state
        B, T, C = feats.shape
        mask = length_mask(rel_lens, T, dtype=feats.dtype)[..., None]  # (B,T,1)
        denom = jnp.maximum(mask.sum(axis=(1,)), 1.0)  # (B, 1)
        cur_mean = (feats * mask).sum(axis=1) / denom  # (B, C)
        var = ((feats - cur_mean[:, None, :]) ** 2 * mask).sum(axis=1) / denom
        cur_std = jnp.sqrt(jnp.maximum(var, eps))  # (B, C)

        if self.norm_type == "sentence":
            out = feats
            if self.mean_norm:
                out = out - cur_mean[:, None, :]
            if self.std_norm:
                out = out / cur_std[:, None, :]
            return out.astype(in_dtype), state

        if self.norm_type == "batch":
            out = feats
            if self.mean_norm:
                out = out - cur_mean.mean(axis=0)
            if self.std_norm:
                out = out / jnp.maximum(cur_std.mean(axis=0), eps)
            return out.astype(in_dtype), state

        # global: fold batch stats into running averages when updating
        count = state["count"]
        # stats update while epoch < update_until_epoch (SpeechBrain freezes
        # from that epoch on)
        do_update = jnp.asarray(
            update and True, jnp.float32
        ) * (jnp.asarray(epoch, jnp.float32) < self.update_until_epoch)
        new_count = count + do_update * B
        w_old = jnp.where(new_count > 0, count / jnp.maximum(new_count, 1.0), 0.0)
        w_new = jnp.where(new_count > 0, 1.0 - w_old, 0.0)
        # first-ever update is implied: count==0 makes w_old 0 / w_new 1,
        # so upd_* already equal the batch stats
        upd_mean = w_old * state["glob_mean"] + w_new * cur_mean.mean(axis=0)
        upd_std = w_old * state["glob_std"] + w_new * cur_std.mean(axis=0)
        glob_mean = jnp.where(do_update > 0, upd_mean, state["glob_mean"])
        glob_std = jnp.where(do_update > 0, upd_std, state["glob_std"])
        glob_std = jnp.maximum(glob_std, eps)

        out = feats
        if self.mean_norm:
            out = out - glob_mean
        if self.std_norm:
            out = out / glob_std
        new_state = {
            "count": new_count,
            "glob_mean": glob_mean,
            "glob_std": glob_std,
        }
        return out.astype(in_dtype), new_state
