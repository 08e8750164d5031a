"""Shared wav2vec2 plumbing for the w2v_* recipes."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


class W2VMixin:
    """Computes wav2vec2 features and length-matches them to the fbank frame
    axis (zero-pad / crop), mirroring reference
    ``models/w2v_MD_VAE/model.py:31-40``.  The reference asserts the raw
    length difference is in [-2, 0]; with bucketed static shapes the padded
    gap can be larger, and padded frames are masked by the relative lens
    downstream.

    Frozen-trunk feature cache: with ``freeze: True`` the trunk is
    deterministic (gradients stopped AND dropout disabled —
    ``modules/wav2vec2.py`` ``train = train and not self.freeze``, matching
    the reference wrapper's eval-mode freeze), so its output for a batch is
    identical every epoch.  ``augment_device_batch`` therefore runs the
    trunk ONCE per cached batch and attaches the length-matched features as
    a ``w2v_feat`` batch key; ``_w2v_feats`` consumes them inside the
    jitted step, the raw waveforms are dropped from the cached batch (they
    existed only to feed the trunk, and at w2v scale they are the largest
    tensor in every scan chunk), and the 317M-param forward drops out of
    the per-step graph entirely (the reference recomputes it every step).
    Bit-exact in BOTH precision modes: under ``--bf16`` the features are
    computed with the same bf16-cast params/wavs the in-step AMP path
    would use (``tests/test_w2v_recipes.py::
    test_w2v_frozen_feature_cache_bit_exact``).  Opt out with
    ``MLVAE_W2V_FROZEN_CACHE=0`` (e.g. to A/B step cost)."""

    W2V_FEAT_KEY = "w2v_feat"

    @staticmethod
    def _match_len(w2v, T: int):
        """Length-match the w2v frame axis to the fbank frame count (the
        ONE definition shared by the cached and in-step paths)."""
        diff = T - w2v.shape[1]
        if diff > 0:
            w2v = jnp.pad(w2v, ((0, 0), (0, diff), (0, 0)))
        elif diff < 0:
            w2v = w2v[:, :T]
        return w2v

    def augment_device_batch(self, dev):
        dev = super().augment_device_batch(dev)
        enc = self.modules.get("wav2vec2")
        # fit-scope only: in a single-pass standalone eval (cli.test) the
        # cache has zero reuse, and the per-shape trunk programs it
        # compiles leak host memory through the axon PJRT plugin — the
        # round-5 f32 TEST run grew to 130 GB host RSS and was OOM-killed
        # (runs/r5/logs/test_w2v_mdvae_f32.log).  During fit the shape set
        # is bounded and revisited every epoch, where the cache took
        # frozen-trunk epochs from 74 s to 2.2 s.
        if (enc is None or not getattr(enc, "freeze", False)
                or not getattr(self, "_fitting", False)
                or self.params is None or "wav2vec2" not in self.params
                or "wav" not in dev or "feat" not in dev
                or os.environ.get("MLVAE_W2V_FROZEN_CACHE", "1").lower()
                in ("0", "false")):
            return dev

        fn = getattr(self, "_w2v_frozen_fn", None)
        if fn is None:
            def frozen_feats(params, wavs, T):
                return self._match_len(
                    enc.apply(params, wavs, rng=None, train=False), T)

            fn = jax.jit(frozen_feats, static_argnums=2)
            self._w2v_frozen_fn = fn
        p, wavs = self.params["wav2vec2"], dev["wav"][0]
        if self.auto_mix_prec:
            # reproduce the in-step AMP policy exactly (brain._cast_floats
            # casts the whole param tree and every data array of ndim>=2),
            # so cached and in-step features are bit-identical under bf16
            from mlvae_tpu.training.brain import _cast_floats
            p = _cast_floats(p, jnp.bfloat16)
            wavs = _cast_floats(wavs, jnp.bfloat16, min_ndim=2)
        feats = fn(p, wavs, int(dev["feat"][0].shape[1]))
        out = dict(dev)
        # relative lengths: reuse the fbank frame lens (downstream masking
        # is driven by batch["feat"] lens; the w2v axis is length-matched)
        out[self.W2V_FEAT_KEY] = (feats, dev["feat"][1])
        # the waveforms existed only to feed the trunk; dropping them from
        # the cached batch reclaims the largest tensor in the device-batch
        # cache and every scanned-epoch stack
        out.pop("wav", None)
        return out

    def _w2v_feats(self, params, batch, stream, train):
        cached = batch.get(self.W2V_FEAT_KEY)
        if cached is not None:
            return cached[0]
        wavs, _ = batch["wav"]
        w2v = self.modules["wav2vec2"].apply(
            params["wav2vec2"], wavs, rng=stream, train=train
        )
        return self._match_len(w2v, batch["feat"][0].shape[1])
