from mlvae_tpu.nn.core import Module, RngStream
from mlvae_tpu.nn.layers import Linear, Sequential, LeakyReLU, Softplus, Identity
from mlvae_tpu.nn.rnn import LSTM

__all__ = [
    "Module",
    "RngStream",
    "Linear",
    "Sequential",
    "LeakyReLU",
    "Softplus",
    "Identity",
    "LSTM",
]
