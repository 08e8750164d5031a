"""Augmentation hook: shape-preserving, actually perturbs, flows through the
data pipeline into aug_feat/aug labels."""
import numpy as np

from mlvae_tpu.ops.augment import WaveAugment


def test_wave_augment_shape_and_perturbation():
    aug = WaveAugment(speeds=[0.9, 1.1], noise_snr_db=20)
    wave = np.sin(np.arange(8000) / 20).astype(np.float32)
    out = aug(wave[None])
    assert out.shape == (1, 8000)
    assert not np.allclose(out[0], wave)
    # energy in the same ballpark (not silenced, not exploded)
    r = float(np.mean(out ** 2) / np.mean(wave ** 2))
    assert 0.3 < r < 3.0
