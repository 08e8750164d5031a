"""2-D convolution (channels-last) with torch-style init."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, uniform_init


class Conv2d(Module):
    """NHWC conv with SAME padding (the layout XLA prefers on TPU)."""

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=(1, 1), bias: bool = True):
        super().__init__()
        self.in_channels = int(in_channels)
        self.out_channels = int(out_channels)
        if isinstance(kernel_size, int):  # torch-style scalar broadcast
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        self.kernel_size = tuple(int(k) for k in kernel_size)
        self.stride = tuple(int(s) for s in stride)
        self.bias = bool(bias)

    def init(self, rng):
        wk, bk = jax.random.split(rng)
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": uniform_init(
                wk, (kh, kw, self.in_channels, self.out_channels), bound
            )
        }
        if self.bias:
            params["bias"] = uniform_init(bk, (self.out_channels,), bound)
        return params

    def apply(self, params, x, **kwargs):
        y = jax.lax.conv_general_dilated(
            x, params["weight"],
            window_strides=self.stride,
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        if self.bias:
            y = y + params["bias"]
        return y


def max_pool(x, window, strides):
    """Max pooling over spatial dims of NHWC, VALID padding (torch default)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + tuple(window) + (1,),
        (1,) + tuple(strides) + (1,),
        "VALID",
    )


def layer_norm(x, gamma, beta, eps: float = 1e-5):
    # f32 statistics (torch-autocast policy, same as every other norm in
    # the repo); output returns in the stream dtype
    xf = jnp.asarray(x, jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) \
        * jnp.asarray(gamma, jnp.float32) + jnp.asarray(beta, jnp.float32)
    return out.astype(x.dtype)
