"""Strict env-flag parsing for the Pallas kernel gates (ADVICE round 2:
MLVAE_PALLAS_DECODE=true must not silently disable the kernels)."""
import pytest

from mlvae_tpu.utils.envflags import env_bool, env_tristate


@pytest.mark.parametrize("raw,expected", [
    ("1", True), ("true", True), ("YES", True), ("on", True), ("y", True),
    ("0", False), ("False", False), ("no", False), ("OFF", False),
])
def test_env_bool_spellings(monkeypatch, raw, expected):
    monkeypatch.setenv("MLVAE_X", raw)
    assert env_bool("MLVAE_X", not expected) is expected


def test_env_bool_default_when_unset(monkeypatch):
    monkeypatch.delenv("MLVAE_X", raising=False)
    assert env_bool("MLVAE_X", True) is True
    monkeypatch.setenv("MLVAE_X", "  ")
    assert env_bool("MLVAE_X", False) is False


def test_env_bool_rejects_junk(monkeypatch):
    monkeypatch.setenv("MLVAE_X", "enable")
    with pytest.raises(ValueError, match="MLVAE_X"):
        env_bool("MLVAE_X", True)


def test_env_tristate(monkeypatch):
    monkeypatch.setenv("MLVAE_X", "AUTO")
    assert env_tristate("MLVAE_X") == "auto"
    monkeypatch.setenv("MLVAE_X", "yes")
    assert env_tristate("MLVAE_X") is True
    monkeypatch.setenv("MLVAE_X", "off")
    assert env_tristate("MLVAE_X") is False
    monkeypatch.delenv("MLVAE_X", raising=False)
    assert env_tristate("MLVAE_X") == "auto"
    monkeypatch.setenv("MLVAE_X", "fused")
    with pytest.raises(ValueError):
        env_tristate("MLVAE_X")
