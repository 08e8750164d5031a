"""Global seed plumbing.

The reference seeds torch globally from YAML load time
(``!apply:torch.manual_seed [!ref <seed>]``, reference ``config/run.yaml:2-3``).
JAX has no global PRNG; instead ``manual_seed`` records the seed and the
training core derives explicit ``jax.random`` keys from it (threefry), one per
step/module, which is the TPU-native equivalent.
"""
from __future__ import annotations

_GLOBAL_SEED: int = 0


def manual_seed(seed: int) -> int:
    """YAML-visible alias for ``torch.manual_seed``: records the global seed.

    Returns the seed so ``__set_seed`` holds a harmless value.
    """
    global _GLOBAL_SEED
    _GLOBAL_SEED = int(seed)
    return _GLOBAL_SEED


def get_seed() -> int:
    return _GLOBAL_SEED


def use_deterministic_algorithms(*args, **kwargs) -> None:
    """Alias for ``torch.use_deterministic_algorithms``: a no-op.

    XLA compilation is deterministic given a fixed seed and static shapes, so
    there is no switch to flip (reference ``train.py:7``).
    """
    return None
