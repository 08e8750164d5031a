"""CRDNN acoustic encoder and VanillaNN.

Capability parity with SpeechBrain's ``lobes.models.CRDNN.CRDNN`` as the
reference configures it (``models/CRDNN_CTC/model.yaml:24-35``): CNN blocks
(conv2d + layernorm + activation + frequency pooling + dropout), optional
time pooling, a bidirectional recurrent trunk, and DNN blocks.

TPU-native substitutions: channels-last conv layout (NHWC, the layout Mosaic
/XLA tile best), and a bidirectional LSTM trunk in place of SpeechBrain's
default LiGRU (same capability class; LSTM reuses this framework's fused
scan kernel).  Time pooling divides the frame rate by ``time_pooling_size``
(default 4, matching SpeechBrain); downstream CTC segmentation resamples
back to the feature rate exactly like the reference
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
        time_pooling_size: int = 4,
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
        for i in range(self.cnn_blocks):
            out_ch = self.cnn_channels[i]
            self.child(f"conv{i}", Conv2d(in_ch, out_ch, self.kernel))
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
        # layernorm scales per conv block
        for i in range(self.cnn_blocks):
            c = self.cnn_channels[i]
            params[f"ln{i}"] = {
                "gamma": jnp.ones((c,)), "beta": jnp.zeros((c,))
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
            conv = self.children[f"conv{i}"]
            x = conv.apply(params[f"conv{i}"], x)
            x = layer_norm(x, params[f"ln{i}"]["gamma"],
                           params[f"ln{i}"]["beta"])
            x = leaky_relu(x)
            x = max_pool(x, (1, self.freq_pooling_size),
                         (1, self.freq_pooling_size))
            if train and stream is not None:
                x = dropout(stream.next(), x, self.dropout_rate, train)
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
