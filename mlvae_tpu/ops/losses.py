"""Loss helpers mapped from SpeechBrain names."""
from __future__ import annotations

import jax.numpy as jnp

from mlvae_tpu.nn.dist import categorical_log_prob
from mlvae_tpu.utils.tensor import apply_lens_to_loss


def nll_loss(log_probabilities, targets, length=None, reduction="mean",
             allowed_len_diff: int = 3):
    """SpeechBrain-signature NLL over (B, T, K) log-probs and (B, T) int
    targets, masked by relative lengths.  Like SB, a time-length mismatch
    of up to ``allowed_len_diff`` frames (pooling/rounding off-by-ones) is
    tolerated by truncating both to the shorter."""
    Tp, Tt = log_probabilities.shape[1], targets.shape[1]
    if Tp != Tt:
        diff = abs(Tp - Tt)
        if diff > allowed_len_diff:
            raise ValueError(
                f"predictions/targets time mismatch {Tp} vs {Tt} exceeds "
                f"allowed_len_diff={allowed_len_diff}")
        T = min(Tp, Tt)
        log_probabilities = log_probabilities[:, :T]
        targets = targets[:, :T]
    nll = -categorical_log_prob(log_probabilities, targets)
    if length is None:
        # SB applies the reduction via an all-ones mask
        if reduction == "batch":
            return jnp.mean(nll, axis=tuple(range(1, nll.ndim)))
        return jnp.mean(nll)
    return apply_lens_to_loss(nll, length, reduction)
