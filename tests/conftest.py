"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that every sharding/collective
code path is exercised without TPU hardware (the driver separately dry-runs
the multi-chip path). This mirrors the strategy recommended in SURVEY.md §4.
"""
import os

# Must be set before jax is imported anywhere.  The ambient environment may
# pin JAX_PLATFORMS to the TPU backend; tests always run on the virtual CPU
# mesh, so override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# keep the suite hermetic: never persist compiled programs into the user's
# real ~/.cache from unit tests (test_compile_cache.py re-enables it
# against tmp_path explicitly)
os.environ["MLVAE_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

# The ambient axon (TPU) plugin can win platform selection even with
# JAX_PLATFORMS set; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 123456
