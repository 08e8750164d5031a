"""Persistent XLA compilation cache plumbing (utils/compile_cache.py).

The functional effect (a second process serving compiles from disk) is
exercised end to end on hardware; these tests pin down the plumbing: the
config knobs are set, the directory resolves/creates, the env kill-switch
works, and the CLI parses the opt-out.  conftest.py sets
``MLVAE_COMPILE_CACHE=0`` suite-wide so ordinary tests never persist
programs; each test here re-enables explicitly and restores the jax config
it touched.
"""
import os

import jax
import pytest

from mlvae_tpu.utils.compile_cache import enable_compile_cache


@pytest.fixture
def cache_env(monkeypatch):
    """Clean env + jax-config restore around each cache test."""
    monkeypatch.delenv("MLVAE_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("MLVAE_COMPILE_CACHE_DIR", raising=False)
    before = {
        n: getattr(jax.config, n)
        for n in ("jax_compilation_cache_dir",
                  "jax_persistent_cache_min_compile_time_secs",
                  "jax_persistent_cache_min_entry_size_bytes",
                  "jax_compilation_cache_max_size")
    }
    yield monkeypatch
    for n, v in before.items():
        jax.config.update(n, v)


def test_enable_creates_dir_and_sets_config(tmp_path, cache_env):
    d = tmp_path / "xcache"
    got = enable_compile_cache(str(d))
    assert got == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    assert jax.config.jax_compilation_cache_max_size > 0
    # a jitted call must write an entry to the directory; the program must
    # be unique to this test, or an in-process executable-cache hit would
    # skip the persistent write (no recompile -> no entry)
    salt = abs(hash(str(d))) % 1000 + 2
    import jax.numpy as jnp

    jax.jit(lambda x: (x * salt).sum() + x[::3].prod())(
        jnp.arange(float(salt)))
    assert any(d.iterdir())


def test_orphan_entry_swept_and_writes_recover(tmp_path, cache_env):
    """A ``*-cache`` file with no ``*-atime`` sidecar (process killed
    mid-put) breaks every future write of jax's size-bounded LRU cache;
    enable_compile_cache must sweep it so entries accrue again."""
    d = tmp_path / "xcache"
    d.mkdir()
    (d / "jit_torn-deadbeef-cache").write_bytes(b"torn")
    # an intact pair must survive the sweep
    (d / "jit_ok-cafe-cache").write_bytes(b"ok")
    (d / "jit_ok-cafe-atime").write_bytes((1).to_bytes(8, "little"))
    assert enable_compile_cache(str(d)) == str(d)
    assert not (d / "jit_torn-deadbeef-cache").exists()
    assert (d / "jit_ok-cafe-cache").exists()
    assert (d / "jit_ok-cafe-atime").exists()
    # a new compile must now write (cache+atime) without warnings
    salt = abs(hash(str(d))) % 1000 + 1001
    import jax.numpy as jnp

    jax.jit(lambda x: (x * salt).sum() - x[1::2].max())(
        jnp.arange(float(salt)))
    names = {p.name for p in d.iterdir()}
    new_caches = {n for n in names
                  if n.endswith("-cache") and n != "jit_ok-cafe-cache"}
    assert new_caches
    for n in new_caches:
        assert n[:-len("-cache")] + "-atime" in names


def test_env_kill_switch(tmp_path, cache_env):
    cache_env.setenv("MLVAE_COMPILE_CACHE", "0")
    before = jax.config.jax_compilation_cache_dir
    assert enable_compile_cache(str(tmp_path / "never")) is None
    assert not (tmp_path / "never").exists()
    assert jax.config.jax_compilation_cache_dir == before


def test_env_dir_override(tmp_path, cache_env):
    d = tmp_path / "from_env"
    cache_env.setenv("MLVAE_COMPILE_CACHE_DIR", str(d))
    assert enable_compile_cache() == str(d)
    assert d.is_dir()


def test_cli_run_opt_parses():
    from mlvae_tpu.cli.args import parse_arguments

    _, run_opts, _ = parse_arguments(
        ["cfg.yaml", "--compile_cache", "False",
         "--compile_cache_dir", "/tmp/x"]
    )
    assert run_opts["compile_cache"] is False
    assert run_opts["compile_cache_dir"] == "/tmp/x"


def test_cli_missing_value_is_clean_error():
    from mlvae_tpu.cli.args import parse_arguments

    with pytest.raises(ValueError, match="needs a value"):
        parse_arguments(["cfg.yaml", "--compile_cache_dir"])
