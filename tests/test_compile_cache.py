"""Persistent XLA compilation cache plumbing (utils/compile_cache.py).

The functional effect (a second process serving compiles from disk) is
exercised end to end on hardware; these tests pin down the plumbing: the
config knobs are set, the directory resolves/creates, the env kill-switch
works, and the CLI wires it by default with ``--compile_cache False``
opting out.
"""
import os

import jax

from mlvae_tpu.utils.compile_cache import enable_compile_cache


def test_enable_creates_dir_and_sets_config(tmp_path, monkeypatch):
    d = tmp_path / "xcache"
    got = enable_compile_cache(str(d))
    assert got == str(d)
    assert d.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(d)
    # a jitted call must write an entry to the directory
    jax.jit(lambda x: x * 2)(3.0)
    assert any(d.iterdir())


def test_env_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv("MLVAE_COMPILE_CACHE", "0")
    assert enable_compile_cache(str(tmp_path / "never")) is None
    assert not (tmp_path / "never").exists()


def test_env_dir_override(tmp_path, monkeypatch):
    d = tmp_path / "from_env"
    monkeypatch.setenv("MLVAE_COMPILE_CACHE_DIR", str(d))
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
