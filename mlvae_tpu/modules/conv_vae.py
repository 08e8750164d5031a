"""Convolutional VAE over spectrogram patches (BASELINE.json gate config
"Conv encoder/decoder VAE on fbank spectrogram patches, fixed-length
batches"; the reference's VAE family is FC/LSTM-based, so this module is
the conv member of the conv/GRU/dense stack family the north star names).

TPU-first choices: NHWC layout end to end (the layout XLA tiles onto the
MXU), stride-2 convs for downsampling, and nearest-neighbor upsample +
conv for the decoder (resize+conv maps to dense MXU work and avoids
transposed-conv checkerboarding).  Output contract matches the other VAE
modules (reference ``modules/vanilla_vae.py`` style): per-element losses,
caller applies masking/weighting.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.conv import Conv2d
from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import Linear, leaky_relu
from mlvae_tpu.nn import dist as D


def _upsample2x(x):
    """Nearest-neighbor 2x upsample of NHWC spatial dims."""
    B, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class ConvVAE(Module):
    """Conv encoder -> latent -> conv decoder on (B, H, W) patches.

    ``patch_shape`` (H, W) must be divisible by ``2**len(channels)``.
    ``channels`` lists encoder feature maps per stride-2 stage; the
    decoder mirrors them.
    """

    def __init__(self, patch_shape: Sequence[int], latent_size: int,
                 channels: Sequence[int] = (32, 64),
                 kernel_size: int = 3):
        super().__init__()
        self.patch_shape = tuple(int(s) for s in patch_shape)
        self.latent_size = int(latent_size)
        self.channels = [int(c) for c in channels]
        self.kernel_size = int(kernel_size)

        H, W = self.patch_shape
        n = len(self.channels)
        if H % (2 ** n) or W % (2 ** n):
            raise ValueError(
                f"patch_shape {self.patch_shape} not divisible by 2^{n}")
        self.bottom = (H // 2 ** n, W // 2 ** n, self.channels[-1])
        flat = self.bottom[0] * self.bottom[1] * self.bottom[2]

        ks = (self.kernel_size, self.kernel_size)
        in_c = 1
        for i, c in enumerate(self.channels):
            self.child(f"enc{i}", Conv2d(in_c, c, ks, stride=(2, 2)))
            in_c = c
        self.mean_fc = self.child("mean_fc", Linear(flat, latent_size))
        self.log_var_fc = self.child("log_var_fc", Linear(flat, latent_size))
        self.dec_in = self.child("dec_in", Linear(latent_size, flat))
        rev = list(reversed(self.channels))
        for i in range(len(rev)):
            out_c = rev[i + 1] if i + 1 < len(rev) else rev[-1]
            self.child(f"dec{i}", Conv2d(rev[i], out_c, ks))
        self.dec_out = self.child("dec_out", Conv2d(rev[-1], 1, ks))

    def encode(self, params, patches):
        x = patches[..., None]  # (B, H, W, 1)
        for i in range(len(self.channels)):
            x = leaky_relu(
                self.children[f"enc{i}"].apply(params[f"enc{i}"], x))
        flat = x.reshape(x.shape[0], -1)
        mean = self.mean_fc.apply(params["mean_fc"], flat)
        log_var = self.log_var_fc.apply(params["log_var_fc"], flat)
        return mean, log_var

    def decode(self, params, z):
        x = leaky_relu(self.dec_in.apply(params["dec_in"], z))
        x = x.reshape((z.shape[0],) + self.bottom)
        for i in range(len(self.channels)):
            x = _upsample2x(x)
            x = leaky_relu(
                self.children[f"dec{i}"].apply(params[f"dec{i}"], x))
        x = self.dec_out.apply(params["dec_out"], x)
        return x[..., 0]  # (B, H, W)

    def apply(self, params, patches, rng=None, train: bool = False,
              **kwargs):
        stream = RngStream.ensure(rng)
        mean, log_var = self.encode(params, patches)
        sampled_h = D.reparameterize(stream.next(), mean, log_var)
        recon = self.decode(params, sampled_h)
        return {
            "mean": mean,
            "log_var": log_var,
            "sampled_h": sampled_h,
            "recon": recon,
            # per-element losses; caller reduces (fixed-length patches
            # need no masking)
            "loss": D.kld_std_normal(mean, log_var),
            "recon_loss": (recon - patches) ** 2,
        }
