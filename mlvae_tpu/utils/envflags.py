"""Strict environment-flag parsing for the Pallas kernel gates.

Benchmark/A-B runs flip these flags constantly; a silently-misparsed value
(``MLVAE_PALLAS_DECODE=true`` reading as "off") invalidates the comparison,
so unrecognized values raise at import time instead of defaulting.
"""
from __future__ import annotations

import os

_TRUTHY = {"1", "true", "yes", "on", "y"}
_FALSY = {"0", "false", "no", "off", "n"}


def env_bool(name: str, default: bool) -> bool:
    """Parse a boolean env var accepting common truthy/falsy spellings
    (case-insensitive).  Unset/empty -> ``default``; anything else raises."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    val = raw.strip().lower()
    if val in _TRUTHY:
        return True
    if val in _FALSY:
        return False
    raise ValueError(
        f"{name}={raw!r} is not a recognized boolean "
        f"(use one of {sorted(_TRUTHY | _FALSY)})")


def env_tristate(name: str, default: str = "auto"):
    """Parse a bool-or-'auto' env var.  Returns True/False/'auto'; unset or
    empty -> ``default``; anything else raises."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return default
    val = raw.strip().lower()
    if val == "auto":
        return "auto"
    return env_bool(name, default=False)
