"""Dotted-name resolution with TPU aliases.

Reference YAMLs name torch/SpeechBrain classes (e.g. ``!new:torch.nn.LSTM``,
``!new:speechbrain.processing.features.InputNormalization``).  This registry
maps every such name used anywhere in the reference recipes (enumerated from
``/root/reference/src/**/*.yaml``) onto the TPU-native equivalent, so those
YAMLs load unmodified.  Unknown names fall back to prefix remaps
(``modules.`` → ``mlvae_tpu.modules.`` etc.) and finally to a plain import.
"""
from __future__ import annotations

import importlib
import pydoc
from typing import Any, Callable, Dict, Optional

# exact dotted name -> dotted target in this package
_ALIASES: Dict[str, str] = {
    # seeding / determinism (reference config/run.yaml:2-4)
    "torch.manual_seed": "mlvae_tpu.utils.seed.manual_seed",
    "torch.use_deterministic_algorithms": "mlvae_tpu.utils.seed.use_deterministic_algorithms",
    # core nn (reference models/MD_VAE/model.yaml:78-83)
    "torch.nn.LSTM": "mlvae_tpu.nn.rnn.LSTM",
    "torch.nn.GRU": "mlvae_tpu.nn.rnn.GRU",
    "torch.nn.LeakyReLU": "mlvae_tpu.nn.layers.LeakyReLU",
    # optimizers (reference models/*/model.yaml)
    "torch.optim.Adam": "mlvae_tpu.training.optim.Adam",
    "torch.optim.Adadelta": "mlvae_tpu.training.optim.Adadelta",
    "torch.optim.SGD": "mlvae_tpu.training.optim.SGD",
    # speechbrain surface used by the recipes
    "speechbrain.utils.epoch_loop.EpochCounter": "mlvae_tpu.training.epoch_loop.EpochCounter",
    "speechbrain.utils.checkpoints.Checkpointer": "mlvae_tpu.training.checkpointer.Checkpointer",
    "speechbrain.processing.features.InputNormalization": "mlvae_tpu.nn.norm.InputNormalization",
    "speechbrain.lobes.features.Fbank": "mlvae_tpu.ops.fbank.Fbank",
    "speechbrain.nnet.linear.Linear": "mlvae_tpu.nn.sb_compat.SBLinear",
    "speechbrain.nnet.activations.Softmax": "mlvae_tpu.nn.sb_compat.Softmax",
    "speechbrain.nnet.schedulers.NewBobScheduler": "mlvae_tpu.training.schedulers.NewBobScheduler",
    "speechbrain.nnet.losses.ctc_loss": "mlvae_tpu.ops.ctc.ctc_loss",
    "speechbrain.nnet.losses.nll_loss": "mlvae_tpu.ops.losses.nll_loss",
    "speechbrain.lobes.models.CRDNN.CRDNN": "mlvae_tpu.modules.crdnn.CRDNN",
    "speechbrain.lobes.models.VanillaNN.VanillaNN": "mlvae_tpu.modules.crdnn.VanillaNN",
    "speechbrain.lobes.models.huggingface_wav2vec.HuggingFaceWav2Vec2":
        "mlvae_tpu.modules.wav2vec2.Wav2Vec2Encoder",
    "speechbrain.alignment.aligner.HMMAligner": "mlvae_tpu.modules.hmm_aligner.HMMAligner",
    # stdlib passthroughs used by hyperpyyaml itself
    "getattr": "builtins.getattr",
}

# dotted-name prefixes remapped into this package
_PREFIX_REMAPS = [
    ("modules.", "mlvae_tpu.modules."),
    ("utils.", "mlvae_tpu.utils."),
    ("models.", "mlvae_tpu.models."),
    ("datasets.", "mlvae_tpu.data.datasets."),
]

# programmatic registrations (tests, user extensions)
_EXTRA: Dict[str, Any] = {}


def register(name: str, target: Any) -> None:
    """Register an object (or dotted path) under a YAML-visible name."""
    _EXTRA[name] = target


def _locate_dotted(path: str) -> Optional[Any]:
    obj = pydoc.locate(path)
    if obj is not None:
        return obj
    # pydoc.locate can fail on lazily-importable modules; try manual split.
    parts = path.split(".")
    for i in range(len(parts) - 1, 0, -1):
        mod_name = ".".join(parts[:i])
        try:
            mod = importlib.import_module(mod_name)
        except ImportError:
            continue
        obj = mod
        try:
            for attr in parts[i:]:
                obj = getattr(obj, attr)
            return obj
        except AttributeError:
            continue
    return None


def locate(name: str) -> Optional[Any]:
    """Resolve a dotted name from YAML to a live python object."""
    if name in _EXTRA:
        target = _EXTRA[name]
        return _locate_dotted(target) if isinstance(target, str) else target
    if name in _ALIASES:
        return _locate_dotted(_ALIASES[name])
    for prefix, replacement in _PREFIX_REMAPS:
        if name.startswith(prefix):
            obj = _locate_dotted(replacement + name[len(prefix):])
            if obj is not None:
                return obj
    return _locate_dotted(name)
