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
# keep the suite hermetic: the CLI entry points under test never persist
# compiled programs into the user's real cache dir (test_compile_cache.py
# re-enables that path against tmp_path explicitly) ...
os.environ["MLVAE_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

# The ambient axon (TPU) plugin can win platform selection even with
# JAX_PLATFORMS set; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")

# ... but the SUITE keeps its own persistent compile cache: the end-to-end
# tests are compile-bound (the fused MD_VAE step alone costs minutes on
# CPU), and the programs are identical across suite runs.  Keyed by HLO
# hash, so source changes that alter a program never hit stale entries.
if os.environ.get("MLVAE_TEST_COMPILE_CACHE", "1").lower() not in ("0", "false"):
    _cache = os.path.expanduser("~/.cache/mlvae_tpu/test_xla_cache")
    os.makedirs(_cache, exist_ok=True)
    # one torn entry (a killed pytest run) would break every future cache
    # write in the size-bounded LRU cache; sweep before pointing jax at it
    from pathlib import Path as _Path

    from mlvae_tpu.utils.compile_cache import _repair_orphans

    _repair_orphans(_Path(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_compilation_cache_max_size", 4 * 1024**3)
    jax.config.update("jax_compilation_cache_dir", _cache)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 123456


# Loss-weight keys the reference recipes leave undefined (defaulted to 1
# with a UserWarning, reference md_model.py:189-201).  Smoke tests inject
# the same value EXPLICITLY so the real weighting path — not the warning
# default — is exercised (VERDICT round 2 item 6).
_DEFAULTED_WEIGHT_KEYS = [
    "recon_weight", "phn_recog_bce_weight", "boundary_bce_weight",
    "boundary_kld_weight", "vae_kld_weight", "kld_weight", "pi_nll_weight",
    "rif_weight", "entropy_weight", "baseline_weight", "nll_weight",
    "ctc_weight",
]


def explicit_default_weights(model_yaml_path) -> str:
    """YAML override fragment pinning every weight key the recipe's yaml
    does NOT define to the reference default 1.0 (keys already in the yaml
    keep their reference values — overriding those would break parity)."""
    from pathlib import Path
    text = Path(model_yaml_path).read_text()
    missing = [k for k in _DEFAULTED_WEIGHT_KEYS if f"{k}:" not in text]
    return ", ".join(f"{k}: 1.0" for k in missing)
