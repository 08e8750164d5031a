"""CRDNN acoustic encoder and VanillaNN.

Capability parity with SpeechBrain's ``lobes.models.CRDNN.CRDNN`` as the
reference configures it (``models/CRDNN_CTC/model.yaml:24-35``): each CNN
block stacks TWO conv stages (conv + LayerNorm over (freq, channels) +
activation, twice) followed by frequency max-pooling and CHANNEL dropout
(SB ``Dropout2d``); optional time pooling (``time_pooling_size`` defaults
to SB's 2); a bidirectional recurrent trunk; and DNN blocks.

TPU-native substitutions, documented rather than silent: channels-last
conv layout (NHWC, the layout Mosaic/XLA tile best); a bidirectional LSTM
trunk in place of SB's default LiGRU (same capability class; reuses this
framework's fused recurrence kernel); LayerNorm in the DNN blocks where SB
uses BatchNorm1d (a running-stats-free normalizer fits the functional
step; the DNN trunk is 2 layers).  Downstream CTC segmentation resamples
pooled time back to the feature rate exactly like the reference
(``models/CRDNN_CTC/model.py:136``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.conv import Conv2d, layer_norm, max_pool
from mlvae_tpu.nn.layers import Linear, dropout, leaky_relu
from mlvae_tpu.nn.rnn import LSTM


def _ln_fc(x, gamma, beta, eps: float = 1e-5):
    """LayerNorm over the trailing (freq, channels) dims with an (F, C)
    affine — SB's LayerNorm on 4-D (B, T, F, C) conv activations."""
    xf = jnp.asarray(x, jnp.float32)
    m = xf.mean(axis=(-2, -1), keepdims=True)
    v = ((xf - m) ** 2).mean(axis=(-2, -1), keepdims=True)
    out = (xf - m) * jax.lax.rsqrt(v + eps) * gamma + beta
    return out.astype(x.dtype)


def _dropout_channels(rng, x, rate: float):
    """torch Dropout2d semantics: each channel drops as a unit."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class CRDNN(Module):
    def __init__(
        self,
        input_size: int,
        activation=None,
        dropout: float = 0.15,
        cnn_blocks: int = 2,
        cnn_channels: Sequence[int] = (128, 256),
        cnn_kernelsize: Sequence[int] = (3, 3),
        time_pooling: bool = False,
        time_pooling_size: int = 2,  # SpeechBrain's default
        freq_pooling_size: int = 2,
        rnn_layers: int = 4,
        rnn_neurons: int = 512,
        rnn_bidirectional: bool = True,
        dnn_blocks: int = 2,
        dnn_neurons: int = 512,
        **kwargs,
    ):
        super().__init__()
        self.input_size = int(input_size)
        self.dropout_rate = float(dropout)
        self.cnn_blocks = int(cnn_blocks)
        self.cnn_channels = tuple(int(c) for c in cnn_channels)
        self.kernel = tuple(int(k) for k in cnn_kernelsize)
        self.time_pooling = bool(time_pooling)
        self.time_pooling_size = int(time_pooling_size)
        self.freq_pooling_size = int(freq_pooling_size)
        self.dnn_blocks = int(dnn_blocks)
        self.dnn_neurons = int(dnn_neurons)

        in_ch = 1
        freq = self.input_size
        self._block_freqs = []  # freq entering each block (for (F,C) norms)
        for i in range(self.cnn_blocks):
            out_ch = self.cnn_channels[i]
            self._block_freqs.append(freq)
            # SB CNN_Block: TWO conv stages per block
            self.child(f"conv{i}a", Conv2d(in_ch, out_ch, self.kernel))
            self.child(f"conv{i}b", Conv2d(out_ch, out_ch, self.kernel))
            in_ch = out_ch
            freq = freq // self.freq_pooling_size
        rnn_in = freq * in_ch
        self.rnn = self.child(
            "rnn",
            LSTM(rnn_in, rnn_neurons, rnn_layers, batch_first=True,
                 dropout=self.dropout_rate, bidirectional=rnn_bidirectional),
        )
        dnn_in = rnn_neurons * (2 if rnn_bidirectional else 1)
        for i in range(self.dnn_blocks):
            self.child(f"dnn{i}", Linear(dnn_in, self.dnn_neurons))
            dnn_in = self.dnn_neurons

    def init(self, rng):
        params = {}
        for i, (name, child) in enumerate(self.children.items()):
            params[name] = child.init(jax.random.fold_in(rng, i))
        # SB LayerNorm inside CNN blocks normalizes over (freq, channels)
        # with an (F, C) affine; both stages of a block see the same F
        # (padding='same' convs; pooling happens after the norms)
        for i in range(self.cnn_blocks):
            c = self.cnn_channels[i]
            f = self._block_freqs[i]
            for stage in ("a", "b"):
                params[f"ln{i}{stage}"] = {
                    "gamma": jnp.ones((f, c)), "beta": jnp.zeros((f, c))
                }
        for i in range(self.dnn_blocks):
            params[f"dnn_ln{i}"] = {
                "gamma": jnp.ones((self.dnn_neurons,)),
                "beta": jnp.zeros((self.dnn_neurons,)),
            }
        return params

    def apply(self, params, feats, rng=None, train: bool = False, **kwargs):
        stream = RngStream.ensure(rng) if (train and self.dropout_rate > 0) \
            else None
        x = feats[..., None]  # (B, T, F, 1)
        for i in range(self.cnn_blocks):
            for stage in ("a", "b"):
                x = self.children[f"conv{i}{stage}"].apply(
                    params[f"conv{i}{stage}"], x)
                x = _ln_fc(x, params[f"ln{i}{stage}"]["gamma"],
                           params[f"ln{i}{stage}"]["beta"])
                x = leaky_relu(x)
            x = max_pool(x, (1, self.freq_pooling_size),
                         (1, self.freq_pooling_size))
            if train and stream is not None:
                # SB Dropout2d: whole CHANNELS drop together
                x = _dropout_channels(stream.next(), x, self.dropout_rate)
        if self.time_pooling:
            x = max_pool(x, (self.time_pooling_size, 1),
                         (self.time_pooling_size, 1))
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x, _ = self.rnn.apply(params["rnn"], x, rng=stream, train=train)
        for i in range(self.dnn_blocks):
            x = self.children[f"dnn{i}"].apply(params[f"dnn{i}"], x)
            x = layer_norm(x, params[f"dnn_ln{i}"]["gamma"],
                           params[f"dnn_ln{i}"]["beta"])
            x = leaky_relu(x)
            if train and stream is not None:
                x = dropout(stream.next(), x, self.dropout_rate, train)
        return x


class VanillaNN(Module):
    """MLP stack (alias of ``speechbrain.lobes.models.VanillaNN.VanillaNN``,
    used by the HMM aligner recipe)."""

    def __init__(self, input_shape=None, input_size=None,
                 dnn_blocks: int = 2, dnn_neurons: int = 512, **kwargs):
        super().__init__()
        if input_size is None:
            if input_shape is None:
                raise ValueError("need input_size or input_shape")
            input_size = int(input_shape[-1])
        self.dnn_blocks = int(dnn_blocks)
        in_size = int(input_size)
        for i in range(self.dnn_blocks):
            self.child(f"lin{i}", Linear(in_size, int(dnn_neurons)))
            in_size = int(dnn_neurons)

    def apply(self, params, x, rng=None, train: bool = False, **kwargs):
        for i in range(self.dnn_blocks):
            x = self.children[f"lin{i}"].apply(params[f"lin{i}"], x)
            x = leaky_relu(x)
        return x
