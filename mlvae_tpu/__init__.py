"""mlvae_tpu: a TPU-native speech / hierarchical-VAE mispronunciation-detection
framework.

Capability parity target: the reference PyTorch/SpeechBrain codebase
``weiwei-ww/ML-VAE`` (see SURVEY.md).  Internals are brand-new and TPU-first:

* functional modules (pure ``init``/``apply`` over param pytrees) instead of
  ``torch.nn.Module`` state,
* one fused, jitted train step (forward + masked ELBO + grads + multi-optimizer
  update) instead of eager ``loss.backward()`` loops,
* a fused XLA/Pallas log-mel front-end instead of Kaldi subprocess pipelines,
* on-device ``lax.scan`` Viterbi MD decoding (plus a native C++ host decoder)
  instead of joblib process pools,
* ``jax.sharding`` data parallelism over an ICI mesh instead of (unused) DDP.

The HyperPyYAML-style config surface of the reference is reproduced so that
reference recipe YAMLs load unmodified (see ``mlvae_tpu.hyperyaml``).
"""

__version__ = "0.1.0"
