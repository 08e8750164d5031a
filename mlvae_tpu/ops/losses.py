"""Loss helpers mapped from SpeechBrain names."""
from __future__ import annotations

import jax.numpy as jnp

from mlvae_tpu.nn.dist import categorical_log_prob
from mlvae_tpu.utils.tensor import apply_lens_to_loss


def nll_loss(log_probabilities, targets, length=None, reduction="mean"):
    """SpeechBrain-signature NLL over (B, T, K) log-probs and (B, T) int
    targets, masked by relative lengths."""
    nll = -categorical_log_prob(log_probabilities, targets)
    if length is None:
        return jnp.mean(nll)
    return apply_lens_to_loss(nll, length, reduction)
