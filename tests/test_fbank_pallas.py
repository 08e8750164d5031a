"""Pallas fbank kernel vs numpy golden (interpret mode on the CPU mesh)."""
import numpy as np

import jax
import jax.numpy as jnp

from mlvae_tpu.ops import frontend_ref as ref
from mlvae_tpu.ops.fbank import kaldi_frame_counts
from mlvae_tpu.ops.fbank_pallas import kaldi_fbank_pallas


def _wave(n, seed=0, scale=8000.0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    sig = np.sin(2 * np.pi * 220 * t) + 0.3 * np.sin(2 * np.pi * 1330 * t)
    return (scale * sig + 100.0 * rs.randn(n)).astype(np.float32)


def test_pallas_fbank_matches_golden():
    w1, w2 = _wave(16000, 0), _wave(9000, 1)
    g1, g2 = ref.kaldi_fbank(w1), ref.kaldi_fbank(w2)
    Lpad = 16000
    waves = np.zeros((2, Lpad), np.float32)
    waves[0] = w1
    waves[1, :9000] = w2
    max_frames = int(kaldi_frame_counts(Lpad, 320))
    interpret = jax.default_backend() != "tpu"
    got, n_frames = kaldi_fbank_pallas(
        jnp.asarray(waves), jnp.asarray([16000, 9000]),
        max_frames=max_frames, interpret=interpret,
    )
    assert int(n_frames[0]) == g1.shape[0]
    assert int(n_frames[1]) == g2.shape[0]
    for got_i, g in [(np.asarray(got[0, : g1.shape[0]]), g1),
                     (np.asarray(got[1, : g2.shape[0]]), g2)]:
        rel = np.max(np.abs(got_i - g) / np.maximum(np.abs(g), 1e-3))
        assert rel < 1e-4, rel


def test_hardware_ab_artifact_recorded():
    """The round-3 hardware A/B (tools/bench_fbank_pallas.py, real v5e) must
    stay recorded and parity-clean: Pallas vs fused-XLA bit-tight on-device.
    The timing verdict (a wash at prep shapes) is documented in PERF.md's
    rejected-experiments list."""
    import json
    from pathlib import Path

    art = Path(__file__).resolve().parent.parent / "docs" / "fbank_pallas_ab.json"
    assert art.exists(), "run tools/bench_fbank_pallas.py on the TPU"
    rec = json.loads(art.read_text())
    assert rec["platform"] == "tpu"
    assert rec["pallas_vs_xla_max_rel"] < 1e-4
    assert rec["shape"]["B"] == 256  # the real prep dispatch shape
