"""wav2vec2 waveform encoder (YAML alias of SpeechBrain's
``HuggingFaceWav2Vec2`` as the w2v recipes use it, e.g. reference
``models/w2v_MD_VAE/model.yaml:11-15``).

Faithful wav2vec2 topology (conv feature extractor -> feature projection ->
transformer encoder with convolutional relative position embeddings), in the
functional Module style: ``init(rng) -> params``, ``apply(params, wavs)``.
Both HF config families are supported:

* ``feat_extract_norm="group"`` + post-LN encoder (wav2vec2-base)
* ``feat_extract_norm="layer"`` + conv biases + pre-LN ("stable layer norm")
  encoder (wav2vec2-large-lv60, the reference's flagship source,
  reference ``models/w2v_MD_VAE/model.yaml:13-17``).

Interface parity with the reference wrapper: called on raw ``(B, L)``
waveforms, returns ``(B, T, hidden)`` at one frame per 320 samples (conv
stack kernels/strides (10,3,3,3,3,2,2)/(5,2,2,2,2,2,2)) so frame counts line
up with the reference's fbank-length padding (``w2v_MD_VAE/model.py:35-40``);
``normalize_wav`` and ``output_norm`` reproduce the SB wrapper's
``F.layer_norm(x, x.shape)`` semantics — ONE mean/var over the entire
padded batch tensor (a reference quirk: statistics couple across the batch
and its padding), not per-utterance stats.
``freeze: True`` (the flagship setting) stops gradients and is additionally
excluded from optimizers by the recipes' optimizer routing.

TPU notes: the transformer trunk is pure batched matmul (MXU-friendly); the
L encoder layers are STACKED into leading-axis arrays and run under one
``lax.scan``, so compile time is O(1) in depth and XLA pipelines the layers.

Weight sourcing: zero-egress environment, so pretrained checkpoints load
ONLY from a local HF snapshot (``local_files_only=True``; ``save_path`` is
probed as a fallback snapshot dir).  When found, the snapshot's config
overrides the constructed architecture and ``init`` returns the converted
weights; otherwise the encoder keeps its random initialization — same
topology, documented substitution.  Conversion is tested numerically against
``transformers``' torch ``Wav2Vec2Model`` in ``tests/test_wav2vec2_hf.py``.
"""
from __future__ import annotations

import os
import logging
import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.nn.core import Module, RngStream, uniform_init

logger = logging.getLogger(__name__)

_CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
_CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)

# HF config families (transformers Wav2Vec2Config defaults)
_BASE_ARCH = dict(
    hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
    intermediate_size=3072, feat_extract_norm="group", conv_bias=False,
    do_stable_layer_norm=False,
)
_LARGE_ARCH = dict(
    hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
    intermediate_size=4096, feat_extract_norm="layer", conv_bias=True,
    do_stable_layer_norm=True,
)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # HF uses exact erf gelu


def _whole_tensor_norm(x, eps: float):
    """``F.layer_norm(x, x.shape)``: one mean/var over EVERY element of the
    tensor, batch and padding included — the SpeechBrain wrapper applies
    this to both the input waveform and the encoder output; f32 stats."""
    xf = jnp.asarray(x, jnp.float32)
    m = xf.mean()
    v = ((xf - m) ** 2).mean()
    return ((xf - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def _ln(x, scale, bias, eps):
    # f32 statistics (torch-autocast policy: LayerNorm runs fp32); output
    # returns in the stream dtype so AMP keeps the trunk bf16.
    xf = jnp.asarray(x, jnp.float32)
    m = xf.mean(axis=-1, keepdims=True)
    v = ((xf - m) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - m) * jax.lax.rsqrt(v + eps) * jnp.asarray(scale, jnp.float32) \
        + jnp.asarray(bias, jnp.float32)
    return out.astype(x.dtype)


class Wav2Vec2Encoder(Module):
    def __init__(self, source: str = "", output_norm: bool = True,
                 freeze: bool = True, save_path: Optional[str] = None,
                 output_size: int = 1024, normalize_wav: bool = True,
                 hidden_size: Optional[int] = None,
                 num_hidden_layers: Optional[int] = None,
                 num_attention_heads: Optional[int] = None,
                 intermediate_size: Optional[int] = None,
                 conv_dim: Optional[Sequence[int]] = None,
                 conv_kernel: Sequence[int] = _CONV_KERNELS,
                 conv_stride: Sequence[int] = _CONV_STRIDES,
                 conv_bias: Optional[bool] = None,
                 feat_extract_norm: Optional[str] = None,
                 do_stable_layer_norm: Optional[bool] = None,
                 num_conv_pos_embeddings: int = 128,
                 num_conv_pos_embedding_groups: int = 16,
                 layer_norm_eps: float = 1e-5,
                 hidden_dropout: float = 0.1, feat_proj_dropout: float = 0.1,
                 attention_dropout: float = 0.1,
                 **kwargs):
        super().__init__()
        self.source = source
        self.output_norm = bool(output_norm)
        self.freeze = bool(freeze)
        self.normalize_wav = bool(normalize_wav)
        self.save_path = save_path

        # --- resolve architecture: local snapshot config > kwargs > family
        hf_cfg = self._find_local_config()
        if hf_cfg is not None:
            arch = dict(
                hidden_size=hf_cfg.hidden_size,
                num_hidden_layers=hf_cfg.num_hidden_layers,
                num_attention_heads=hf_cfg.num_attention_heads,
                intermediate_size=hf_cfg.intermediate_size,
                feat_extract_norm=hf_cfg.feat_extract_norm,
                conv_bias=hf_cfg.conv_bias,
                do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
            )
            conv_dim = tuple(hf_cfg.conv_dim)
            conv_kernel = tuple(hf_cfg.conv_kernel)
            conv_stride = tuple(hf_cfg.conv_stride)
            num_conv_pos_embeddings = hf_cfg.num_conv_pos_embeddings
            num_conv_pos_embedding_groups = \
                hf_cfg.num_conv_pos_embedding_groups
            layer_norm_eps = hf_cfg.layer_norm_eps
            hidden_dropout = getattr(hf_cfg, "hidden_dropout",
                                     hidden_dropout)
            feat_proj_dropout = getattr(hf_cfg, "feat_proj_dropout",
                                        feat_proj_dropout)
            attention_dropout = getattr(hf_cfg, "attention_dropout",
                                        attention_dropout)
            if hf_cfg.hidden_size != output_size:
                logger.warning(
                    "wav2vec2 snapshot hidden_size=%d overrides "
                    "output_size=%d", hf_cfg.hidden_size, output_size)
        else:
            # family defaults by declared size; tiny sizes (tests) shrink
            # depth/width proportionally but keep the exact topology
            fam = _BASE_ARCH if output_size == 768 else _LARGE_ARCH
            if output_size >= 768:
                arch = dict(fam)
            else:
                arch = dict(fam, hidden_size=output_size,
                            num_hidden_layers=2,
                            num_attention_heads=max(1, output_size // 32),
                            intermediate_size=4 * output_size)
        # explicit kwargs always win
        for k, v in [("hidden_size", hidden_size),
                     ("num_hidden_layers", num_hidden_layers),
                     ("num_attention_heads", num_attention_heads),
                     ("intermediate_size", intermediate_size),
                     ("conv_bias", conv_bias),
                     ("feat_extract_norm", feat_extract_norm),
                     ("do_stable_layer_norm", do_stable_layer_norm)]:
            if v is not None:
                arch[k] = v

        self.hidden_size = int(arch["hidden_size"])
        self.output_size = self.hidden_size
        self.num_hidden_layers = int(arch["num_hidden_layers"])
        self.num_attention_heads = int(arch["num_attention_heads"])
        self.intermediate_size = int(arch["intermediate_size"])
        self.feat_extract_norm = str(arch["feat_extract_norm"])
        self.conv_bias = bool(arch["conv_bias"])
        self.do_stable_layer_norm = bool(arch["do_stable_layer_norm"])
        self.conv_dim = tuple(conv_dim) if conv_dim is not None \
            else (512,) * len(conv_kernel)
        self.conv_kernel = tuple(int(k) for k in conv_kernel)
        self.conv_stride = tuple(int(s) for s in conv_stride)
        self.num_conv_pos_embeddings = int(num_conv_pos_embeddings)
        self.num_conv_pos_embedding_groups = \
            int(num_conv_pos_embedding_groups)
        self.layer_norm_eps = float(layer_norm_eps)
        self.hidden_dropout = float(hidden_dropout)
        self.feat_proj_dropout = float(feat_proj_dropout)
        self.attention_dropout = float(attention_dropout)
        if self.hidden_size % self.num_attention_heads:
            raise ValueError(
                f"num_attention_heads ({self.num_attention_heads}) must "
                f"divide hidden_size ({self.hidden_size})")

        # weights load lazily in init() and the host copy is released after
        # transfer — wav2vec2-large is ~1.2 GB of numpy that must not stay
        # pinned for the Brain's lifetime alongside the device copy
        self._has_snapshot = hf_cfg is not None
        self._pretrained_loaded = False

    # ------------------------------------------------------------------ HF
    def _candidate_sources(self):
        out = []
        if self.source:
            out.append(self.source)
        if self.save_path:
            out.append(self.save_path)
        return out

    def _find_local_config(self):
        for src in self._candidate_sources():
            try:
                from transformers import AutoConfig
                cfg = AutoConfig.from_pretrained(src, local_files_only=True)
                logger.info("local wav2vec2 config found at %s", src)
                return cfg
            except Exception:
                continue
        if self.source:
            logger.info(
                "no local pretrained snapshot for %s; using the "
                "randomly-initialized same-topology encoder", self.source)
        return None

    def _try_load_pretrained(self):
        for src in self._candidate_sources():
            try:
                from transformers import Wav2Vec2Model
                model = Wav2Vec2Model.from_pretrained(
                    src, local_files_only=True)
                params = params_from_hf_model(model)
                logger.info("loaded pretrained wav2vec2 weights from %s", src)
                return params
            except Exception as e:  # pragma: no cover - depends on disk
                logger.info("could not load weights from %s: %s", src, e)
        return None

    # ---------------------------------------------------------------- init
    def init(self, rng):
        if self._has_snapshot:
            pre = self._try_load_pretrained()
            if pre is not None:
                self._pretrained_loaded = True
                out = jax.tree_util.tree_map(jnp.asarray, pre)
                del pre  # release the host numpy copy
                return out
        H, I, L = self.hidden_size, self.intermediate_size, \
            self.num_hidden_layers
        ks = iter(jax.random.split(rng, 64))

        ext: Dict[str, Any] = {}
        in_ch = 1
        for i, (k, _s, out_ch) in enumerate(
                zip(self.conv_kernel, self.conv_stride, self.conv_dim)):
            bound = 1.0 / math.sqrt(in_ch * k)
            d = {"weight": uniform_init(next(ks), (k, in_ch, out_ch), bound)}
            if self.conv_bias:
                d["bias"] = jnp.zeros((out_ch,))
            if (self.feat_extract_norm == "layer"
                    or (self.feat_extract_norm == "group" and i == 0)):
                d["norm_scale"] = jnp.ones((out_ch,))
                d["norm_bias"] = jnp.zeros((out_ch,))
            ext[f"conv{i}"] = d
            in_ch = out_ch

        def lin(key, n_in, n_out):
            b = 1.0 / math.sqrt(n_in)
            return (uniform_init(key, (n_in, n_out), b),
                    uniform_init(jax.random.fold_in(key, 1), (n_out,), b))

        pw, pb = lin(next(ks), self.conv_dim[-1], H)
        proj = {"norm_scale": jnp.ones((self.conv_dim[-1],)),
                "norm_bias": jnp.zeros((self.conv_dim[-1],)),
                "w": pw, "b": pb}

        kpc = self.num_conv_pos_embeddings
        g = self.num_conv_pos_embedding_groups
        std = math.sqrt(4.0 / (kpc * H))
        pos_conv = {
            "weight": std * jax.random.normal(next(ks), (kpc, H // g, H)),
            "bias": jnp.zeros((H,)),
        }

        def stack_lin(key, n_in, n_out):
            ws, bs = zip(*[lin(jax.random.fold_in(key, i), n_in, n_out)
                           for i in range(L)])
            return jnp.stack(ws), jnp.stack(bs)

        layers: Dict[str, Any] = {}
        for name in ("q", "k", "v", "o"):
            layers[f"{name}_w"], layers[f"{name}_b"] = stack_lin(next(ks), H, H)
        layers["ff_in_w"], layers["ff_in_b"] = stack_lin(next(ks), H, I)
        layers["ff_out_w"], layers["ff_out_b"] = stack_lin(next(ks), I, H)
        for name in ("ln1", "ln2"):
            layers[f"{name}_s"] = jnp.ones((L, H))
            layers[f"{name}_b"] = jnp.zeros((L, H))

        return {"extractor": ext, "proj": proj, "pos_conv": pos_conv,
                "enc_norm": {"scale": jnp.ones((H,)),
                             "bias": jnp.zeros((H,))},
                "layers": layers}

    # --------------------------------------------------------------- apply
    def _feature_extractor(self, params, x):
        # x: (B, L, 1)
        eps = self.layer_norm_eps
        for i, (k, s) in enumerate(zip(self.conv_kernel, self.conv_stride)):
            p = params[f"conv{i}"]
            x = jax.lax.conv_general_dilated(
                x, p["weight"], (s,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            if "bias" in p:
                x = x + p["bias"]
            if self.feat_extract_norm == "layer":
                x = _ln(x, p["norm_scale"], p["norm_bias"], eps)
            elif self.feat_extract_norm == "group" and i == 0:
                # HF GroupNorm(C, C): per-channel norm over time; f32 stats
                xf = jnp.asarray(x, jnp.float32)
                m = xf.mean(axis=1, keepdims=True)
                v = ((xf - m) ** 2).mean(axis=1, keepdims=True)
                xf = (xf - m) * jax.lax.rsqrt(v + eps)
                x = (xf * p["norm_scale"] + p["norm_bias"]).astype(x.dtype)
            x = _gelu(x)
        return x

    def _pos_conv(self, params, h):
        y = jax.lax.conv_general_dilated(
            h, params["weight"], (1,),
            [(self.num_conv_pos_embeddings // 2,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.num_conv_pos_embedding_groups)
        y = y + params["bias"]
        if self.num_conv_pos_embeddings % 2 == 0:  # HF SamePadLayer
            y = y[:, :-1]
        return _gelu(y)

    def _attention(self, lp, h, key, train):
        B, T, H = h.shape
        nh = self.num_attention_heads
        hd = H // nh

        def heads(x):
            return x.reshape(B, T, nh, hd)

        q = heads(h @ lp["q_w"] + lp["q_b"]) * (hd ** -0.5)
        k = heads(h @ lp["k_w"] + lp["k_b"])
        v = heads(h @ lp["v_w"] + lp["v_b"])
        # scores/softmax in f32 (torch autocast puts softmax on the fp32
        # list); the value contraction returns to the stream dtype
        scores = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = self._dropout_key(attn, self.attention_dropout, key, train)
        attn = attn.astype(h.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(B, T, H)
        return out @ lp["o_w"] + lp["o_b"]

    def _encoder(self, params, h, stream, train):
        eps = self.layer_norm_eps
        h = h + self._pos_conv(params["pos_conv"], h)
        en = params["enc_norm"]
        if not self.do_stable_layer_norm:
            h = _ln(h, en["scale"], en["bias"], eps)
        h = self._dropout(h, self.hidden_dropout, stream, train)

        stable = self.do_stable_layer_norm
        L = self.num_hidden_layers
        dropping = train and stream is not None
        # per-layer dropout keys ride the scan as an xs input (4 draws per
        # layer: attention probs, post-attention, activation, FFN output —
        # the HF Wav2Vec2EncoderLayer/Wav2Vec2FeedForward dropout sites)
        if dropping:
            layer_keys = jax.random.split(stream.next(), L * 4).reshape(
                L, 4, 2)
        else:
            layer_keys = jnp.zeros((L, 4, 2), jnp.uint32)

        def ffn(h_in, lp, keys):
            f = _gelu(h_in @ lp["ff_in_w"] + lp["ff_in_b"])
            f = self._dropout_key(f, self.hidden_dropout, keys[2], dropping)
            f = f @ lp["ff_out_w"] + lp["ff_out_b"]
            return self._dropout_key(f, self.hidden_dropout, keys[3],
                                     dropping)

        def body(h, xs):
            lp, keys = xs
            if stable:  # pre-LN (large-lv60)
                a = self._attention(lp, _ln(h, lp["ln1_s"], lp["ln1_b"], eps),
                                    keys[0], dropping)
                a = self._dropout_key(a, self.hidden_dropout, keys[1],
                                      dropping)
                h = h + a
                h = h + ffn(_ln(h, lp["ln2_s"], lp["ln2_b"], eps), lp, keys)
            else:  # post-LN (base)
                a = self._attention(lp, h, keys[0], dropping)
                a = self._dropout_key(a, self.hidden_dropout, keys[1],
                                      dropping)
                h = _ln(h + a, lp["ln1_s"], lp["ln1_b"], eps)
                h = _ln(h + ffn(h, lp, keys), lp["ln2_s"], lp["ln2_b"], eps)
            return h, None

        # Per-layer rematerialisation: without it, differentiating the
        # scan saves every layer's residuals — attention probs (B,H,T,T),
        # QKV, and (B,T,4D) FFN intermediates — which at 24 layers is
        # several GiB and (together with the resident 317M-param train
        # state) RESOURCE_EXHAUSTED'd the fine-tuning w2v recipes on a
        # 16 GiB chip (r3b/r4 cnncl runs).  jax.checkpoint keeps only the
        # (B,T,D) carry per layer and recomputes the rest in the backward
        # — the standard TPU memory/FLOPs trade for deep trunks.  Opt out
        # with MLVAE_W2V_REMAT=0 (e.g. small-T ablations).
        scan_body = body
        if os.environ.get("MLVAE_W2V_REMAT", "1").lower() not in (
                "0", "false"):
            # prevent_cse=False: safe (and recommended) under lax.scan,
            # where the staging workarounds prevent_cse inserts are
            # unnecessary and can pessimise the compiled code
            scan_body = jax.checkpoint(body, prevent_cse=False)
        h, _ = jax.lax.scan(scan_body, h, (params["layers"], layer_keys))
        if stable:
            h = _ln(h, en["scale"], en["bias"], eps)
        return h

    def _dropout(self, x, rate, stream, on):
        if not on or rate <= 0.0 or stream is None:
            return x
        return self._dropout_key(x, rate, stream.next(), True)

    def _dropout_key(self, x, rate, key, on):
        if not on or rate <= 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(jnp.asarray(key, jnp.uint32), keep,
                                    x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))

    def apply(self, params, wavs, rng=None, train: bool = False, **kwargs):
        x = jnp.asarray(wavs)
        if self.normalize_wav:
            # SB wrapper semantics: F.layer_norm(wav, wav.shape) — ONE
            # mean/var over the whole padded batch tensor (reference quirk;
            # per-utterance stats would NOT match the reference features)
            x = _whole_tensor_norm(x, eps=1e-5)
        if self.freeze:
            params = jax.lax.stop_gradient(params)
        train = train and not self.freeze
        stream = RngStream.ensure(rng) if (train and rng is not None) \
            else None
        x = self._feature_extractor(params["extractor"], x[..., None])
        h = _ln(x, params["proj"]["norm_scale"], params["proj"]["norm_bias"],
                self.layer_norm_eps)
        h = h @ params["proj"]["w"] + params["proj"]["b"]
        h = self._dropout(h, self.feat_proj_dropout, stream, train)
        h = self._encoder(params, h, stream, train)
        if self.output_norm:
            # SB wrapper: F.layer_norm(out, out.shape) — whole-tensor stats
            h = _whole_tensor_norm(h, eps=1e-5)
        return h

    def __call__(self, *args, **kwargs):
        return self.apply(*args, **kwargs)

    def conv_output_length(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n

    def partition_specs(self, params):
        """Tensor-parallel placement hook consumed by Brain param placement
        when a 'model' mesh axis is active (Megatron column/row split of
        the transformer trunk; see parallel/tp.py)."""
        from mlvae_tpu.parallel.tp import wav2vec2_partition_specs
        return wav2vec2_partition_specs(params)


def params_from_hf_model(model) -> Dict[str, Any]:
    """Convert a transformers torch ``Wav2Vec2Model`` to our param tree.

    Accessing ``pos_conv_embed.conv.weight`` resolves torch's weight-norm
    parametrization to the effective kernel.  Linear weights are stored
    transposed (in, out) so ``apply`` is plain ``x @ w + b``.
    """
    import torch

    def t(x):
        with torch.no_grad():
            return np.ascontiguousarray(x.detach().cpu().numpy())

    ext: Dict[str, Any] = {}
    for i, layer in enumerate(model.feature_extractor.conv_layers):
        d = {"weight": t(layer.conv.weight).transpose(2, 1, 0)}
        if layer.conv.bias is not None:
            d["bias"] = t(layer.conv.bias)
        norm = getattr(layer, "layer_norm", None)
        if norm is not None:
            d["norm_scale"] = t(norm.weight)
            d["norm_bias"] = t(norm.bias)
        ext[f"conv{i}"] = d

    fp = model.feature_projection
    proj = {"norm_scale": t(fp.layer_norm.weight),
            "norm_bias": t(fp.layer_norm.bias),
            "w": t(fp.projection.weight).T, "b": t(fp.projection.bias)}

    pc = model.encoder.pos_conv_embed.conv
    pos_conv = {"weight": t(pc.weight).transpose(2, 1, 0), "bias": t(pc.bias)}

    enc_norm = {"scale": t(model.encoder.layer_norm.weight),
                "bias": t(model.encoder.layer_norm.bias)}

    L = model.encoder.layers

    def stack(get):
        return np.stack([get(layer) for layer in L])

    layers = {}
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                         ("v", "v_proj"), ("o", "out_proj")):
        layers[f"{ours}_w"] = stack(
            lambda l, n=theirs: t(getattr(l.attention, n).weight).T)
        layers[f"{ours}_b"] = stack(
            lambda l, n=theirs: t(getattr(l.attention, n).bias))
    layers["ff_in_w"] = stack(
        lambda l: t(l.feed_forward.intermediate_dense.weight).T)
    layers["ff_in_b"] = stack(
        lambda l: t(l.feed_forward.intermediate_dense.bias))
    layers["ff_out_w"] = stack(
        lambda l: t(l.feed_forward.output_dense.weight).T)
    layers["ff_out_b"] = stack(
        lambda l: t(l.feed_forward.output_dense.bias))
    layers["ln1_s"] = stack(lambda l: t(l.layer_norm.weight))
    layers["ln1_b"] = stack(lambda l: t(l.layer_norm.bias))
    layers["ln2_s"] = stack(lambda l: t(l.final_layer_norm.weight))
    layers["ln2_b"] = stack(lambda l: t(l.final_layer_norm.bias))

    return {"extractor": ext, "proj": proj, "pos_conv": pos_conv,
            "enc_norm": enc_norm, "layers": layers}


def conv_output_length(n: int,
                       kernels: Sequence[int] = _CONV_KERNELS,
                       strides: Sequence[int] = _CONV_STRIDES) -> int:
    for k, s in zip(kernels, strides):
        n = (n - k) // s + 1
    return n
