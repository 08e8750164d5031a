"""Training core: the Brain loop, re-designed around one fused jitted step.

Capability parity with the SpeechBrain ``sb.Brain`` surface the reference
builds on (``fit``/``evaluate``/stage hooks/``compute_forward``/
``compute_objectives``; see reference ``models/md_model.py`` and
``notes/pipeline.txt``), with TPU-native internals:

* recipes implement PURE ``compute_forward(params, states, batch, stage,
  rng)`` and ``compute_objectives(predictions, batch, stage)``; the Brain
  traces forward + masked losses + grads + clip + multi-optimizer update
  into ONE XLA computation per (batch-shape, stage-target) pair;
* module parameters live in an explicit pytree per module name; the
  multi-optimizer setup of the reference (per-module param groups,
  ``md_model.py:20-52``) becomes grad-subtree routing to independent optax
  states;
* stateful pieces (running input normalization) are explicit state pytrees
  threaded through the step;
* gradient hygiene matches ``sb.Brain.check_gradients``: global-norm clip at
  ``max_grad_norm`` and a skip (zero-scale) on non-finite loss/grads;
* randomness is explicit: one threefry key per step folded from the config
  seed (reference seeds torch globally at YAML load,
  ``config/run.yaml:2-3``).
"""
from __future__ import annotations

import functools
import logging
import os
import time
from collections import deque
from enum import Enum, auto
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mlvae_tpu.data.batch import DataLoader, PaddedBatch, prefetch
from mlvae_tpu.training.checkpointer import checkpoint_has
from mlvae_tpu.nn.norm import InputNormalization
from mlvae_tpu.utils import seed as seed_util

logger = logging.getLogger(__name__)


class Stage(Enum):
    TRAIN = auto()
    VALID = auto()
    TEST = auto()


class AttrDict(dict):
    """dict with attribute access (the reference reads hparams as attrs)."""

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key, value):
        self[key] = value


def _global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def _cast_floats(tree, dtype, min_ndim: int = 0):
    """Cast float leaves to ``dtype``.  ``min_ndim`` protects small control
    tensors: relative-length vectors (1-D) and scalar counters must NEVER be
    cast to bf16 — round(rel * T) recovers absolute lengths and bf16
    round-trips corrupt them by 1-2 frames."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            and getattr(x, "ndim", 0) >= min_ndim)
        else x,
        tree,
    )


class Brain:
    def __init__(self, modules: Dict[str, Any], hparams: Dict[str, Any],
                 run_opts: Optional[Dict] = None, checkpointer=None,
                 label_encoder=None, **kwargs):
        self.modules = dict(modules)
        self.hparams = hparams if isinstance(hparams, AttrDict) \
            else AttrDict(hparams)
        self.run_opts = AttrDict(run_opts or {})
        self.checkpointer = checkpointer
        self.label_encoder = label_encoder
        if checkpointer is not None and "async_ckpt" in (run_opts or {}):
            checkpointer.async_save = bool(run_opts["async_ckpt"])

        self.debug = bool(self.run_opts.get("debug", False))
        self.debug_batches = int(self.run_opts.get("debug_batches", 2))
        self.max_grad_norm = float(self.run_opts.get("max_grad_norm", 5.0))
        # mixed precision (parity with sb.Brain's auto_mix_prec AMP path,
        # reference md_model.py:60-76): bf16 compute, f32 params/grads/losses.
        # No loss scaling needed — bf16 shares f32's exponent range.
        self.auto_mix_prec = bool(
            self.run_opts.get("bf16", self.run_opts.get("auto_mix_prec",
                                                        False))
        )

        self.rng = jax.random.PRNGKey(seed_util.get_seed())
        self.mesh = None
        tp = int(self.run_opts.get("tensor_parallel", 1) or 1)
        if self.run_opts.get("data_parallel", False) or tp > 1:
            n = self.run_opts.get("num_devices") or len(jax.devices())
            if tp > 1:
                # 2-D (data, model) mesh: batch over 'data', modules that
                # declare partition_specs (the wav2vec2 trunk) split over
                # 'model'; everything else replicated
                from mlvae_tpu.parallel.tp import make_mesh_2d
                if n % tp:
                    raise ValueError(
                        f"num_devices={n} not divisible by "
                        f"tensor_parallel={tp}")
                self.mesh = make_mesh_2d(n // tp, tp)
                logger.info("mesh: data=%d x model=%d", n // tp, tp)
            else:
                from mlvae_tpu.parallel.mesh import make_mesh
                self.mesh = make_mesh(n)
                logger.info("data-parallel over %d devices", self.mesh.size)
        # GSPMD cannot partition the Pallas LSTM custom call itself; publish
        # the mesh so the LSTM launches its kernels per-shard through
        # jax.shard_map (nn/rnn._pallas_eligible &
        # ops/lstm_pallas.sharded_lstm_layer).  Published UNCONDITIONALLY —
        # a later single-device Brain in the same process must clear a
        # previous Brain's mesh.
        from mlvae_tpu.nn.rnn import set_pallas_mesh
        set_pallas_mesh(self.mesh)
        self.params: Optional[Dict[str, Any]] = None
        self.states: Dict[str, Any] = {}
        self.optimizers: Dict[str, Tuple[Any, Optional[List[str]]]] = {}
        self.opt_states: Dict[str, Any] = {}
        self.step = 0
        self.training = False
        self.avg_train_loss = 0.0
        self.stats_loggers: Dict[str, Any] = {}
        self._compiled: Dict[Any, Callable] = {}
        # device-side batch cache: batch composition repeats every epoch
        # (duration-sorted loaders), so host->device transfer is paid once.
        # Capped; keyed by utterance ids + the consumed key set.
        self.cache_device_batches = bool(
            self.run_opts.get("cache_device_batches", True)
        )
        self._dev_batch_cache: Dict[Any, Dict] = {}
        self._dev_batch_cache_bytes = 0
        self.device_batch_cache_limit = int(
            self.run_opts.get("device_batch_cache_mb", 2048)
        ) * 1024 * 1024
        # set by _autoscale_cache_budget for w2v-scale states (or forced
        # via MLVAE_HBM_TIGHT): depth-1 scan dispatch + single-snapshot
        # async-checkpoint queue
        self._hbm_tight = False
        # ZeRO-1 wrapped optimizers keyed by (opt_name, module); populated
        # by _setup_zero1 when --zero1 and a data axis > 1 are present
        self._zero1_opts: Dict[Any, Any] = {}
        # epoch-in-jit: lax.scan the train step over runs of consecutive
        # same-shape device batches — ONE dispatch per run instead of one
        # per batch (the reference's per-batch eager loop pays a host
        # round trip per step; over a remote device tunnel that dominates
        # the epoch).  Numerics are identical to the per-batch loop: the
        # same rng split sequence and batch order, the same step function.
        self.scan_epoch = bool(self.run_opts.get("scan_epoch", False))
        self._scan_stack_cache: Dict[Any, Any] = {}
        self._scan_stack_cache_bytes = 0
        # Upper bound on batches per scan dispatch.  Scanned epochs stream
        # chunks of at most this many same-shape batches: upload + stack one
        # chunk, dispatch it, release the references.  Bounds peak HBM to
        # O(chunk) batches instead of O(epoch) — the r3b w2v-scale quality
        # runs (317M-param trunk) died RESOURCE_EXHAUSTED because the whole
        # epoch's device batches were resident alongside params + Adam state
        # + pinned async-checkpoint snapshots.
        self.scan_chunk = int(self.run_opts.get("scan_chunk", 32) or 32)
        self.allow_stale_ckpt = bool(
            self.run_opts.get("allow_stale_ckpt", False)
        )

    # ------------------------------------------------------------------
    # recipe contract (pure functions)
    # ------------------------------------------------------------------
    def compute_forward(self, params, states, batch, stage, rng, epoch):
        """Pure forward: returns (predictions, new_states)."""
        raise NotImplementedError

    def compute_objectives(self, predictions, batch, stage):
        """Pure objective: returns (total_loss, losses_dict)."""
        raise NotImplementedError

    def evaluate_predictions(self, predictions, batch, stage):
        """Host-side hook after each VALID/TEST batch (metrics etc.)."""

    def prepare_batch(self, batch: "PaddedBatch") -> "PaddedBatch":
        """Host-side hook before device transfer (e.g. attach pre-saved
        per-utterance tensors keyed by id)."""
        return batch

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init_params(self):
        init_rng = jax.random.PRNGKey(seed_util.get_seed())
        params = {}
        for i, (name, module) in enumerate(sorted(self.modules.items())):
            if hasattr(module, "init"):
                params[name] = module.init(jax.random.fold_in(init_rng, i))
        self.params = params
        n = sum(int(np.prod(np.asarray(l).shape))
                for l in jax.tree_util.tree_leaves(params))
        logger.info("initialized %d parameters across %d modules",
                    n, len(params))

    def _normalizers(self) -> Dict[str, InputNormalization]:
        out = {}
        for name, obj in list(self.hparams.items()) + list(self.modules.items()):
            if isinstance(obj, InputNormalization):
                out[name] = obj
        return out

    def ensure_states(self, feat_dim: int):
        created = False
        for name, norm in self._normalizers().items():
            if name not in self.states:
                self.states[name] = norm.init_state(feat_dim)
                created = True
        if created and self.mesh is not None:
            from mlvae_tpu.parallel.mesh import replicate
            self.states = replicate(self.mesh, self.states)
        pending = getattr(self, "_pending_states_ckpt", None)
        if pending is not None and self.states:
            restored = self.checkpointer.load_checkpoint(
                pending, {"states": self.states}
            )
            if "states" in restored:
                self.states = restored["states"]
                if self.mesh is not None:
                    # restored host arrays: re-replicate over the mesh
                    from mlvae_tpu.parallel.mesh import replicate
                    self.states = replicate(self.mesh, self.states)
            self._pending_states_ckpt = None

    def init_optimizers(self):
        """Single-optimizer default; overridden by MDModel for multi-opt."""
        factory = self.hparams.get("optimizer")
        if factory is None:
            raise ValueError("No optimizers defined.")
        from mlvae_tpu.training.optim import as_factory
        opt = as_factory(factory).make()
        self.optimizers = {"optimizer": (opt, None)}
        self.opt_states = {"optimizer": self._init_opt_state(opt, None)}

    def _opt_module_keys(self, module_names):
        return (sorted(self.params) if module_names is None
                else list(module_names))

    def _init_opt_state(self, opt, module_names):
        """One optimizer state PER MODULE: a module whose losses are
        detached this epoch (target cycling) keeps its state untouched —
        torch parity, where params with grad=None are skipped entirely and
        their per-param Adam step/moments never advance."""
        return {mk: opt.init({mk: self.params[mk]})
                for mk in self._opt_module_keys(module_names)}

    # ------------------------------------------------------------------
    # fused step builders
    # ------------------------------------------------------------------
    def _make_train_step(self):
        """Jitted fused train step with DONATED state buffers: params,
        optimizer states and running states are consumed by the call (XLA
        aliases them onto the outputs), so one resident copy of the
        training state exists during the update instead of two.  At w2v
        scale (317M-param trunk + Adam moments ≈ 5 GiB f32) the
        un-donated input+output double residency was the largest single
        allocation in the r4 ``w2v_CRDNN_CTC_cnncl`` OOMs
        (runs/r4/logs/train_cnncl10e.log).  Callers must treat the passed
        state trees as dead after the call — the fit loops reassign
        ``self.params/opt_states/states`` from the step outputs, and any
        externally held reference (async-checkpoint snapshots) must be
        off-device first (``Checkpointer.wait_device_release``)."""
        return jax.jit(self._make_train_step_raw(), donate_argnums=(0, 1, 2))

    def _make_train_step_raw(self):
        opt_items = [(name, self.optimizers[name][0],
                      self.optimizers[name][1])
                     for name in sorted(self.optimizers)]
        zero1_opts = getattr(self, "_zero1_opts", {})

        def step(params, opt_states, states, rng, batch, epoch):
            def loss_fn(p):
                b, s = batch, states
                if self.auto_mix_prec:
                    p = _cast_floats(p, jnp.bfloat16)
                    # batch: cast data arrays (ndim >= 2) only — never the
                    # relative-length vectors.  States are NOT cast: they are
                    # running statistics (normalizer mean/std, counters) that
                    # must stay f32 — the modules consuming them emit the
                    # activation stream in the activations' dtype themselves
                    # (e.g. InputNormalization returns the input dtype).
                    b = _cast_floats(batch, jnp.bfloat16, min_ndim=2)
                preds, new_states = self.compute_forward(
                    p, s, b, Stage.TRAIN, rng, epoch
                )
                if self.auto_mix_prec:
                    # losses/objectives and running states stay f32
                    preds = _cast_floats(preds, jnp.float32)
                    new_states = _cast_floats(new_states, jnp.float32)
                loss, losses = self.compute_objectives(
                    preds, batch, Stage.TRAIN
                )
                return loss, (losses, new_states)

            (loss, (losses, new_states)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)

            gnorm = _global_norm(grads)
            finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            clip = jnp.minimum(1.0, self.max_grad_norm / (gnorm + 1e-12))
            # non-finite step: REPLACE grads with zeros (NaN * 0 is NaN —
            # multiplying would poison optimizer state permanently)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g * clip, jnp.zeros_like(g)),
                grads,
            )

            new_params = dict(params)
            new_opt_states = {}
            for name, opt, module_names in opt_items:
                new_opt_states[name] = {}
                for mk in self._opt_module_keys(module_names):
                    g_m = {mk: grads[mk]}
                    p_m = {mk: new_params[mk]}
                    opt_mk = zero1_opts.get((name, mk), opt)
                    updates, st = opt_mk.update(g_m, opt_states[name][mk],
                                                p_m)
                    # a module whose grads are ALL zero this step is
                    # inactive (its losses were detached under the current
                    # target, or the step was non-finite): skip it like
                    # torch skips grad=None params — no param drift from
                    # momentum tails, no optimizer-state advance.  Known
                    # deviation: a LIVE module whose grads happen to be
                    # exactly zero (measure-zero event in f32) is also
                    # frozen for that step, where torch would advance its
                    # Adam count; detached-vs-zero can't be told apart from
                    # inside the trace without a loss->module map
                    active = functools.reduce(
                        jnp.logical_or,
                        [jnp.any(g != 0)
                         for g in jax.tree_util.tree_leaves(g_m)],
                        jnp.asarray(False),
                    )
                    new_opt_states[name][mk] = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(active, a, b),
                        st, opt_states[name][mk],
                    )
                    new_params.update(jax.tree_util.tree_map(
                        lambda p, u: p + jnp.where(active, u, 0), p_m,
                        updates,
                    ))
            return new_params, new_opt_states, new_states, loss, losses

        return step

    # Prediction keys the host-side ``evaluate_predictions`` consumes; the
    # jitted eval step returns ONLY these (None = all, the safe default).
    # Everything else — recon means, per-frame logits, branch outputs — stays
    # on device, so the per-batch device->host fetch carries a few small
    # integer sequences instead of the full forward tree.  Over the remote
    # device tunnel that transfer dominated TEST eval wall-clock (r3: 525
    # utts in 4m42s while training sustained ~1000 utt-sec/sec).
    EVAL_PRED_KEYS: Optional[frozenset] = None

    def eval_pred_keys(self, stage: Stage) -> Optional[frozenset]:
        """Keys of ``compute_forward``'s prediction dict that must reach the
        host for ``evaluate_predictions`` / ``save_md_result``.  Recipes
        override via ``EVAL_PRED_KEYS``; None returns the full tree."""
        return self.EVAL_PRED_KEYS

    def _make_eval_step(self, stage: Stage):
        keys = self.eval_pred_keys(stage)

        def step(params, states, rng, batch, epoch):
            preds, _ = self.compute_forward(params, states, batch, stage, rng,
                                            epoch)
            loss, losses = self.compute_objectives(preds, batch, stage)
            if keys is not None and isinstance(preds, dict):
                preds = {k: v for k, v in preds.items() if k in keys}
            return preds, loss, losses

        return jax.jit(step)

    def _step_key(self):
        """Recipes whose traced graph depends on python attrs (e.g. the
        per-epoch training target) include them here to key the jit cache."""
        return getattr(self, "target", None)

    def _get_compiled(self, kind: str, stage: Stage):
        key = (kind, stage, self._step_key())
        if key not in self._compiled:
            if kind == "train":
                self._compiled[key] = self._make_train_step()
            elif kind == "train_raw":
                # unjitted step for embedding in lax.scan: the scan jit
                # carries the donation annotation (donating an inner jit
                # under an outer trace is ignored by XLA)
                self._compiled[key] = self._make_train_step_raw()
            else:
                self._compiled[key] = self._make_eval_step(stage)
        return self._compiled[key]

    # ------------------------------------------------------------------
    # batch conversion
    # ------------------------------------------------------------------
    # Recipes list the batch keys their step consumes.  Unfiltered batches
    # put every dataset key — including raw waveforms whose padded lengths
    # vary per batch — into the jit signature, forcing a recompile on almost
    # every batch (observed: 150+ s "epochs" that are 99% XLA compiles).
    USED_BATCH_KEYS: Optional[set] = None

    def used_batch_keys(self) -> Optional[set]:
        """Keys the jitted step consumes; None = all.  Recipes may override
        to make the set config-dependent."""
        return self.USED_BATCH_KEYS

    def to_device_batch(self, batch: PaddedBatch) -> Dict[str, Tuple]:
        out = {}
        used = self.used_batch_keys()
        # batch divides the DATA axis only (a 2-D mesh's model axis
        # replicates the batch)
        pad_to = dict(self.mesh.shape).get("data", self.mesh.size) \
            if self.mesh is not None else 1
        for key in batch.keys():
            if key == "id":
                continue
            if used is not None and key not in used:
                continue
            arr, lens = batch[key]
            if arr.dtype == np.float64:
                arr = arr.astype(np.float32)
            B = arr.shape[0]
            if B % pad_to != 0:
                # DP: replicate trailing samples so the batch axis divides
                # the mesh (duplicates only affect running loss averages)
                extra = pad_to - B % pad_to
                arr = np.concatenate([arr, arr[-1:].repeat(extra, axis=0)])
                lens = np.concatenate([lens, lens[-1:].repeat(extra, axis=0)])
            out[key] = (jnp.asarray(arr), jnp.asarray(lens))
        if self.mesh is not None:
            from mlvae_tpu.parallel.mesh import shard_batch
            out = shard_batch(self.mesh, out)
        return out

    def augment_device_batch(self, dev: Dict[str, Tuple]) -> Dict[str, Tuple]:
        """Hook: recipes may attach DERIVED device tensors to the batch
        before it is cached — e.g. the w2v recipes precompute the frozen
        wav2vec2 trunk's features once per batch instead of re-running the
        317M-param forward inside every train/eval step
        (``models/w2v_common.W2VMixin``).  Must be deterministic in the
        batch contents (the result is reused across epochs)."""
        return dev

    def _cached_device_batch(self, batch: PaddedBatch):
        if not self.cache_device_batches:
            return self.augment_device_batch(self.to_device_batch(batch))
        used = self.used_batch_keys()
        key = (tuple(batch.ids),
               tuple(sorted(used)) if used is not None else None)
        hit = self._dev_batch_cache.get(key)
        if hit is not None:
            return hit
        dev = self.augment_device_batch(self.to_device_batch(batch))
        nbytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize
            for a, _ in dev.values()
        )
        if self._dev_batch_cache_bytes + nbytes \
                <= self.device_batch_cache_limit:
            self._dev_batch_cache[key] = dev
            self._dev_batch_cache_bytes += nbytes
        return dev

    # ------------------------------------------------------------------
    # fit / evaluate loops
    # ------------------------------------------------------------------
    def make_dataloader(self, dataset, stage: Stage, **loader_kwargs):
        # duration-sorted configs set shuffle=False (reference
        # data_io.py:155-158); 'sorting: random' keeps shuffle=True, which
        # here shuffles BATCH order each epoch (samples stay grouped to keep
        # padded shapes stable for jit)
        kwargs = dict(loader_kwargs)
        shuffle = bool(kwargs.pop("shuffle", False)) and stage == Stage.TRAIN
        return DataLoader(dataset, shuffle=shuffle, **kwargs)

    def _param_partition_specs(self, params):
        """PartitionSpec tree: replicated by default; modules that declare
        ``partition_specs`` (the wav2vec2 trunk) are tensor-split over the
        'model' axis when one exists."""
        from jax.sharding import PartitionSpec as P
        from mlvae_tpu.parallel.tp import validate_tp

        model_axis = dict(self.mesh.shape).get("model", 1)
        specs = {}
        for name, sub in params.items():
            mod = self.modules.get(name)
            if model_axis > 1 and hasattr(mod, "partition_specs"):
                err = validate_tp(mod, model_axis)
                if err:
                    raise ValueError(f"cannot tensor-split {name!r}: {err}")
                specs[name] = mod.partition_specs(sub)
                logger.info("tensor-parallel placement for module %r "
                            "(model axis %d)", name, model_axis)
            else:
                specs[name] = jax.tree_util.tree_map(lambda _: P(), sub)
        return specs

    def _place_params(self, params):
        from mlvae_tpu.parallel.tp import shard_tree
        return shard_tree(self.mesh, params,
                          self._param_partition_specs(params))

    def _place_opt_states(self, opt_states, specs):
        """Adam moments of a tensor-split module must shard LIKE the params
        (replicating them would hold 2 full f32 copies of the trunk per
        device and all-gather sharded grads into them every step); scalar
        state (counts, hyperparams) replicates."""
        from mlvae_tpu.parallel.mesh import replicated
        from mlvae_tpu.parallel.tp import shard_tree

        rep = replicated(self.mesh)
        out = {}
        for name, per_mod in opt_states.items():
            out[name] = {}
            for mk, st in per_mod.items():
                sub_specs = {mk: specs[mk]}
                param_struct = jax.tree_util.tree_structure(
                    {mk: self.params[mk]})

                def is_param_shaped(n, _struct=param_struct):
                    return jax.tree_util.tree_structure(n) == _struct

                out[name][mk] = jax.tree_util.tree_map(
                    lambda n, _s=sub_specs: shard_tree(self.mesh, n, _s)
                    if is_param_shaped(n) else jax.device_put(n, rep),
                    st, is_leaf=is_param_shaped)
        return out

    def _autoscale_cache_budget(self):
        """Shrink the device-batch / scan-stack cache budget when the model
        itself needs most of HBM.  Training keeps ~7x param bytes resident
        (params, grads, two Adam moments, a bf16 cast, up to two pinned
        async-checkpoint snapshots); the default 2 GiB x2 cache budget on
        top of a 317M-param w2v trunk is what exhausted the chip in the r3b
        quality runs.  No-op when the backend exposes no memory stats (CPU
        test meshes) or the model is small."""
        if self.params is None:
            return
        env = os.environ.get("MLVAE_HBM_TIGHT")
        if env is not None:
            # forced either way, even on backends with no memory stats
            # (lets the CPU test mesh exercise the tight code paths)
            self._hbm_tight = env.strip().lower() in ("1", "true", "yes")
        param_bytes = sum(
            int(np.prod(np.asarray(leaf).shape)) * leaf.dtype.itemsize
            for leaf in jax.tree_util.tree_leaves(self.params)
            if hasattr(leaf, "dtype")
        )
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm = int(stats.get("bytes_limit", 0))
        except Exception:
            hbm = 0
        if not hbm:
            env_hbm = os.environ.get("MLVAE_HBM_BYTES")
            platform = getattr(jax.devices()[0], "platform", "")
            if env_hbm:
                hbm = int(env_hbm)
            elif platform in ("tpu", "axon"):
                # tunneled/plugin TPU devices (axon) expose no
                # memory_stats(), which silently disabled BOTH the cache
                # autoscale and HBM-tight mode in the r3b/r4 cnncl OOMs —
                # assume the v5e/v5p per-chip floor so they engage;
                # override with MLVAE_HBM_BYTES for other parts
                hbm = 16 * 1024 ** 3
                # loud, because on larger parts (v4/v5p/v6e) this
                # under-estimate shrinks the cache budget and can wrongly
                # engage depth-1 dispatch — a silent perf regression
                logger.warning(
                    "device exposes no memory_stats(); assuming %d GiB "
                    "HBM for cache autoscale / HBM-tight heuristics — "
                    "set MLVAE_HBM_BYTES to the real per-chip capacity "
                    "if this part is larger", hbm >> 30)
            else:
                return
        # Resident-state ledger (post-donation): params + two Adam moments
        # + transient grads + a bf16 cast ≈ 4.5x param bytes.  (Was 7x when
        # the un-donated step held input+output state copies and async-ckpt
        # snapshots pinned device buffers across epochs; the donating step
        # and the checkpointer's fetch-before-write removed those.)
        reserve = 9 * param_bytes // 2 + 2 * 1024 ** 3  # + activation headroom
        # HBM-tight regime (w2v-scale states): the scanned-epoch dispatch
        # pipeline and the async-checkpoint queue each pin whole extra
        # copies of chunk inputs / training state; when the resident state
        # alone claims most of the chip, degrade both to their
        # minimum-pinning forms (depth-1 dispatch below, single-snapshot
        # ckpt queue in training/checkpointer.py).  r3b/r4 evidence: the
        # 317M w2v trunk RESOURCE_EXHAUSTED'd at epoch ~2 under the
        # default depth-3 window once eval buffers + a pinned snapshot
        # joined it.  MLVAE_HBM_TIGHT=1/0 forces either mode.
        if env is None:
            self._hbm_tight = reserve > (hbm * 3) // 5
        if self._hbm_tight:
            logger.info(
                "HBM-tight mode: depth-1 scan dispatch, single-snapshot "
                "async-ckpt queue (state reserve %d MiB vs HBM %d MiB)",
                reserve >> 20, hbm >> 20)
        budget = max(0, (hbm - reserve) // 2)  # two caches share the limit
        if budget < self.device_batch_cache_limit:
            logger.info(
                "device batch cache budget %d -> %d MiB "
                "(params %d MiB, HBM %d MiB)",
                self.device_batch_cache_limit >> 20, budget >> 20,
                param_bytes >> 20, hbm >> 20)
            self.device_batch_cache_limit = int(budget)

    def on_fit_start(self):
        if self.params is None:
            self.init_params()
        self.init_optimizers()
        self._autoscale_cache_budget()
        if self.mesh is not None:
            from mlvae_tpu.parallel.tp import shard_tree
            specs = self._param_partition_specs(self.params)
            self.params = shard_tree(self.mesh, self.params, specs)
            self.opt_states = self._place_opt_states(self.opt_states, specs)
            self._setup_zero1(specs)
        elif bool(self.run_opts.get("zero1", False)):
            logger.warning("--zero1 requested but this run has no device "
                           "mesh (single device); optimizer-state sharding "
                           "is inactive")

    def place_restored_state(self):
        """Re-apply mesh placement to freshly RESTORED state trees.

        Checkpoint restore yields host arrays; assigning them raw would
        silently drop the TP partition specs, the DP replication AND the
        ZeRO-1 moment sharding that ``on_fit_start`` applied before the
        restore ran (review finding: a resumed ``--zero1`` run would start
        with fully replicated f32 moments — the exact residency ZeRO-1
        removes).  Called by the resume path after ``_restore_state``."""
        if self.mesh is None:
            return
        from mlvae_tpu.parallel.mesh import replicate
        from mlvae_tpu.parallel.tp import shard_tree
        specs = self._param_partition_specs(self.params)
        self.params = shard_tree(self.mesh, self.params, specs)
        self.opt_states = self._place_opt_states(self.opt_states, specs)
        if self.states:
            self.states = replicate(self.mesh, self.states)
        if self._zero1_opts:
            from mlvae_tpu.parallel.zero1 import zero1_place
            for (name, mk) in self._zero1_opts:
                self.opt_states[name][mk] = zero1_place(
                    self.opt_states[name][mk], self.mesh)

    def _setup_zero1(self, param_specs):
        """Optional ZeRO-1: shard optimizer moments of replicated (non-TP)
        modules over the 'data' mesh axis (``--zero1 True``).  Populates
        ``self._zero1_opts[(opt_name, module)]`` consumed by the train
        step, and re-places those modules' existing opt states sharded.
        See parallel/zero1.py."""
        self._zero1_opts = {}
        if not bool(self.run_opts.get("zero1", False)):
            return
        from jax.sharding import PartitionSpec
        from mlvae_tpu.parallel.zero1 import zero1_place, zero1_wrap
        n_data = dict(self.mesh.shape).get("data", 1)
        if n_data <= 1:
            logger.warning("--zero1 requested but the mesh has no 'data' "
                           "axis > 1; ignoring")
            return
        for name, (opt, module_names) in self.optimizers.items():
            wrapped = zero1_wrap(opt, self.mesh)
            for mk in self._opt_module_keys(module_names):
                # TP-split modules already shard moments like their params
                # (_place_opt_states); ZeRO-1 covers the replicated rest
                if any(s != PartitionSpec()
                       for s in jax.tree_util.tree_leaves(
                           param_specs.get(mk, {}))):
                    continue
                self._zero1_opts[(name, mk)] = wrapped
                self.opt_states[name][mk] = zero1_place(
                    self.opt_states[name][mk], self.mesh)
        if self._zero1_opts:
            logger.info(
                "ZeRO-1: optimizer state sharded over %d-way data axis for "
                "%d (optimizer, module) pairs", n_data,
                len(self._zero1_opts))

    def on_fit_end(self):
        if self.checkpointer is not None:
            if hasattr(self.checkpointer, "close"):
                self.checkpointer.close()  # flush + stop the save worker
            elif hasattr(self.checkpointer, "flush"):
                self.checkpointer.flush()

    def on_stage_start(self, stage: Stage, epoch=None):
        self.stats_loggers = {}

    def on_stage_end(self, stage: Stage, stage_loss, epoch=None):
        pass

    def on_evaluate_start(self, max_key=None, min_key=None):
        self._autoscale_cache_budget()
        if self.checkpointer is not None and self.params is not None:
            # restore params AND running states (e.g. input-normalization
            # statistics). The reference loses normalizer stats across
            # processes because its YAML recoverables omit the normalizer
            # (models/test_vanilla_vae/model.yaml:7-12); we checkpoint and
            # restore the full state.
            templates = {"params": self.params}
            if self.states:
                templates["states"] = self.states
            restored, ckpt = self.checkpointer.recover_if_possible(
                templates, max_key=max_key, min_key=min_key
            )
            if restored and "params" in restored:
                self.params = restored["params"]
                if "states" in restored:
                    self.states = restored["states"]
                elif ckpt is not None and checkpoint_has(ckpt, "states"):
                    # states not built yet (lazy feat-dim init): restore them
                    # as soon as ensure_states creates the templates
                    self._pending_states_ckpt = ckpt
                counter = self.hparams.get("epoch_counter")
                if counter is not None and "epoch" in ckpt.meta:
                    counter.current = int(ckpt.meta["epoch"])
                logger.info("recovered checkpoint %s", ckpt.path)
                self._check_recovered_ckpt(ckpt, max_key, min_key)

    # Recipes whose reference yaml selects on a metric the recipe never
    # emits (so key-less fallback is the recipe's NORMAL evaluate path, not
    # a failure) opt out of the stale-checkpoint guard below, e.g.
    # HMM_DNN_ALI (reference models/HMM_DNN_ALI/model.yaml:13).
    ALLOW_KEYLESS_CKPT = False

    def _check_recovered_ckpt(self, ckpt, max_key, min_key):
        """Refuse to evaluate from a checkpoint that evidences a failed or
        barely-started training run, so a crashed multi-epoch train can't
        quietly feed TEST metrics or downstream consumers (r3b: a w2v OOM at
        epoch 1 fed a near-untrained recognizer's posteriors to the
        saved-phn-recog pipeline with every exit code 0).  Matches the
        reference's evaluate-from-best semantics (``test.py:19-24``) where a
        meaningful best checkpoint is assumed to exist.  Override with the
        ``allow_stale_ckpt`` run option.  Debug mode is exempt: ``--debug``
        deliberately truncates training below the configured epochs."""
        if self.allow_stale_ckpt or self.debug:
            return
        limit = getattr(self.hparams.get("epoch_counter"), "limit", None)
        epoch = ckpt.meta.get("epoch")
        if (limit is not None and limit > 1
                and epoch is not None and int(epoch) <= 1):
            raise RuntimeError(
                f"evaluate would use checkpoint {ckpt.path.name} from epoch "
                f"{epoch} of a {limit}-epoch config — the training run that "
                f"produced it almost certainly failed. Re-run training, or "
                f"pass --allow_stale_ckpt to evaluate it anyway.")
        if ((max_key or min_key)
                and getattr(self.checkpointer, "last_selection_fell_back",
                            False)
                and not self.ALLOW_KEYLESS_CKPT):
            raise RuntimeError(
                f"no checkpoint records the selection key "
                f"{max_key or min_key!r}; evaluating the newest checkpoint "
                f"instead could silently score the wrong model. Pass "
                f"--allow_stale_ckpt to accept the newest checkpoint.")

    def fit_batch(self, batch: PaddedBatch) -> float:
        batch = self.prepare_batch(batch)
        dev_batch = self._cached_device_batch(batch)
        # recipes that run extra device work per train batch (e.g.
        # HMM_DNN_ALI realignment) reuse these instead of re-preparing and
        # re-transferring the same batch
        self._last_prepared_batch = batch
        self._last_dev_batch = dev_batch
        feats = dev_batch.get("feat", dev_batch.get("kaldi_feat"))
        if feats is not None:
            self.ensure_states(int(feats[0].shape[-1]))
        self._batch_ids = batch["id"]
        self.rng, step_rng = jax.random.split(self.rng)
        epoch = jnp.asarray(self.current_epoch(), jnp.int32)
        train_step = self._get_compiled("train", Stage.TRAIN)
        (self.params, self.opt_states, self.states, loss, losses) = train_step(
            self.params, self.opt_states, self.states, step_rng, dev_batch,
            epoch,
        )
        self.step += 1
        self._record_losses(losses)
        # return the DEVICE scalar: converting here would block on a host
        # round trip every batch (the fit loop averages once per epoch)
        return loss

    # ------------------------------------------------------------------
    # epoch-in-jit: one dispatch per run of same-shape batches
    # ------------------------------------------------------------------
    @staticmethod
    def _batch_signature(dev: Dict[str, Tuple]):
        return tuple(
            (k, tuple(a.shape), str(a.dtype), tuple(l.shape), str(l.dtype))
            for k, (a, l) in sorted(dev.items())
        )

    def _get_scan_fn(self, sig, K: int):
        ckey = ("train_scan", sig, K, self._step_key())
        fn = self._compiled.get(ckey)
        if fn is None:
            step = self._get_compiled("train_raw", Stage.TRAIN)

            def scan_steps(params, opt_states, states, rngs, batches, epoch):
                def body(carry, xs):
                    p, o, st = carry
                    rng, b = xs
                    p, o, st, loss, losses = step(p, o, st, rng, b, epoch)
                    return (p, o, st), (loss, losses)

                return jax.lax.scan(
                    body, (params, opt_states, states), (rngs, batches)
                )

            # donate the carried training state (see _make_train_step):
            # halves state residency during the epoch's hot loop
            fn = jax.jit(scan_steps, donate_argnums=(0, 1, 2))
            self._compiled[ckey] = fn
        return fn

    def _fit_epoch_scanned(self, train_loader):
        """One TRAIN epoch as ``lax.scan`` over stacked device batches.

        Semantics are IDENTICAL to the per-batch loop: same batch order,
        same per-step rng split sequence, same step function — only the
        dispatch granularity changes (one call per run of consecutive
        same-shape batches instead of one per batch).  Requires the
        device-batch cache (recipes that inject per-batch host state turn
        that off and fall back to the per-batch loop).

        Streams the epoch in chunks of at most ``scan_chunk`` same-shape
        batches: each chunk is uploaded, stacked, dispatched, and its host
        references dropped before the next chunk is built, so peak HBM is
        O(chunk) batches + the in-flight pipeline instead of O(epoch).  A
        depth-2 dispatch pipeline keeps the device busy while bounding how
        many un-executed chunk inputs the runtime can pin.

        Returns (mean train loss, utterance-seconds processed).
        """
        total_frames = 0
        # same epoch source as fit_batch (the counter, not the loop var)
        epoch_arr = jnp.asarray(self.current_epoch(), jnp.int32)
        pending = []  # (per-run loss array, per-run losses dict)

        def dispatch(run, sig):
            K = len(run)
            # reproduce the per-batch loop's rng sequence exactly
            keys = []
            for _ in range(K):
                self.rng, k = jax.random.split(self.rng)
                keys.append(k)
            rngs = jnp.stack(keys)
            stack_key = (tuple(ids for ids, _ in run), sig)
            stacked = self._scan_stack_cache.get(stack_key)
            if stacked is None:
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *(d for _, d in run)
                )
                # byte-capped like the per-batch device cache: under
                # shuffled batch order the run groupings change every
                # epoch and an uncapped map would accumulate stale stacks
                nbytes = sum(
                    int(np.prod(a.shape)) * a.dtype.itemsize
                    for a in jax.tree_util.tree_leaves(stacked)
                )
                if (self._scan_stack_cache_bytes + nbytes
                        <= self.device_batch_cache_limit):
                    self._scan_stack_cache[stack_key] = stacked
                    self._scan_stack_cache_bytes += nbytes
            scan_fn = self._get_scan_fn(sig, K)
            ((self.params, self.opt_states, self.states),
             (ls, lss)) = scan_fn(
                self.params, self.opt_states, self.states, rngs, stacked,
                epoch_arr,
            )
            self.step += K
            pending.append((ls, lss))
            # bound the dispatch queue: wait for the chunk two back before
            # enqueuing more, so at most ~3 chunks' inputs are live in HBM.
            # In HBM-tight mode (w2v-scale resident state) drop to depth 1:
            # at most the current + one dispatched chunk live, trading
            # pipeline overlap for the headroom that r4's cnncl10b run
            # showed the depth-3 window does not leave at 317M params.
            depth = 1 if self._hbm_tight else 3
            if len(pending) >= depth:
                jax.block_until_ready(pending[-depth][0])

        run: List = []
        run_sig = None
        for batch in train_loader:
            prepared = self.prepare_batch(batch)
            dev = self._cached_device_batch(prepared)
            feats = dev.get("feat", dev.get("kaldi_feat"))
            if feats is not None:
                self.ensure_states(int(feats[0].shape[-1]))
            feats_h, lens_h = batch["feat"]
            total_frames += int(
                np.round(np.asarray(lens_h) * feats_h.shape[1]).sum()
            )
            sig = self._batch_signature(dev)
            if run and (sig != run_sig or len(run) >= self.scan_chunk):
                dispatch(run, run_sig)
                run = []
            run_sig = sig
            run.append((tuple(batch.ids), dev))
        if run:
            dispatch(run, run_sig)

        # ONE host sync for the whole epoch's (small) loss arrays
        pending = jax.device_get(pending)
        all_losses = []
        for ls, lss in pending:
            all_losses.extend(np.asarray(ls).tolist())
            K = np.asarray(ls).shape[0]
            for r in range(K):
                self._record_losses(
                    {k: v[r] for k, v in lss.items()}
                )
        mean_loss = float(np.mean(all_losses)) if all_losses else 0.0
        hop_s = getattr(getattr(self, "step_timer", None), "hop_seconds",
                        float(self.hparams.get("hop_length", 20)) / 1000.0)
        return mean_loss, total_frames * hop_s

    def _eval_epoch_scanned(self, loader, stage: Stage, limit=None):
        """One VALID/TEST epoch as ``lax.scan`` over stacked device batches:
        one dispatch + one host fetch per chunk of consecutive same-shape
        batches (at most ``scan_chunk``), then the host-side metric hooks
        (``evaluate_predictions``) replay per batch on the fetched rows.
        Same rng sequence and order as the per-batch loop."""
        epoch_arr = jnp.asarray(self.current_epoch(), jnp.int32)
        losses_all = []
        # (host batches, in-flight device results) — chunk k's results are
        # fetched and replayed on the host while chunk k+1 computes on
        # device, overlapping tunnel transfer + metric loops with compute
        inflight: deque = deque()

        def dispatch(run, sig):
            K = len(run)
            keys = []
            for _ in range(K):
                self.rng, k = jax.random.split(self.rng)
                keys.append(k)
            rngs = jnp.stack(keys)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *(d for _, d in run)
            )
            ckey = ("eval_scan", stage, sig, K, self._step_key())
            scan_fn = self._compiled.get(ckey)
            if scan_fn is None:
                step = self._get_compiled("eval", stage)

                def scan_fn(params, states, rngs, batches, epoch,
                            _step=step):
                    def body(_, xs):
                        rng, b = xs
                        preds, loss, losses = _step(
                            params, states, rng, b, epoch)
                        return None, (preds, loss, losses)

                    return jax.lax.scan(body, None, (rngs, batches))[1]

                scan_fn = jax.jit(scan_fn)
                self._compiled[ckey] = scan_fn
            res = scan_fn(self.params, self.states, rngs, stacked, epoch_arr)
            inflight.append(([hb for hb, _ in run], res))

        def drain():
            host_batches, res = inflight.popleft()
            preds_s, loss_s, losses_s = jax.device_get(res)
            for r in range(len(host_batches)):
                host_batch = host_batches[r]
                self._batch_ids = list(host_batch["id"])
                self._record_losses(
                    jax.tree_util.tree_map(lambda v: v[r], losses_s)
                )
                preds_r = jax.tree_util.tree_map(lambda v: v[r], preds_s)
                self._dispatch_evaluate(preds_r, host_batch, stage)
                losses_all.append(float(np.asarray(loss_s[r])))

        run: List = []
        run_sig = None
        for i, batch in enumerate(loader):
            prepared = self.prepare_batch(batch)
            dev = self._cached_device_batch(prepared)
            feats = dev.get("feat", dev.get("kaldi_feat"))
            if feats is not None:
                self.ensure_states(int(feats[0].shape[-1]))
            sig = self._batch_signature(dev)
            if run and (sig != run_sig or len(run) >= self.scan_chunk):
                dispatch(run, run_sig)
                run = []
                while len(inflight) > 1:
                    drain()
            run_sig = sig
            run.append((prepared, dev))
            if limit is not None and i + 1 >= limit:
                break
        if run:
            dispatch(run, run_sig)
        while inflight:
            drain()
        return float(np.mean(losses_all)) if losses_all else 0.0

    def evaluate_batch(self, batch: PaddedBatch, stage: Stage) -> float:
        batch = self.prepare_batch(batch)
        dev_batch = self._cached_device_batch(batch)
        feats = dev_batch.get("feat", dev_batch.get("kaldi_feat"))
        if feats is not None:
            self.ensure_states(int(feats[0].shape[-1]))
        self._batch_ids = batch["id"]
        self.rng, step_rng = jax.random.split(self.rng)
        epoch = jnp.asarray(self.current_epoch(), jnp.int32)
        eval_step = self._get_compiled("eval", stage)
        preds, loss, losses = eval_step(
            self.params, self.states, step_rng, dev_batch, epoch
        )
        self._record_losses(losses)
        self._dispatch_evaluate(preds, batch, stage)
        return float(loss)

    def _dispatch_evaluate(self, preds, host_batch, stage):
        """Single choke point for handing device predictions to host-side
        evaluation: trims DP replica padding first so per-sample metric
        loops can't index host ground truth out of range.  Every site that
        calls ``evaluate_predictions`` with device output must go through
        here (recipes adding extra eval passes included)."""
        preds = self._trim_replica_padding(preds, len(host_batch.ids))
        self.evaluate_predictions(preds, host_batch, stage)

    def _trim_replica_padding(self, preds, n: int):
        """Under data-parallel ``to_device_batch`` pads the batch axis so B
        divides the mesh's data axis; host-side evaluation must see only
        the ``n`` real samples or per-sample loops index ground truth out
        of range (and duplicated rows would skew the metric stats)."""
        if self.mesh is None:
            return preds
        pad_to = dict(self.mesh.shape).get("data", self.mesh.size)
        padded = n if n % pad_to == 0 else n + (pad_to - n % pad_to)
        if padded == n:
            return preds
        return jax.tree_util.tree_map(
            lambda x: x[:n]
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == padded else x,
            preds,
        )

    def _record_losses(self, losses: Dict[str, jnp.ndarray]):
        for key, value in losses.items():
            stats = self.stats_loggers.get(key + "_stats")
            if stats is not None:
                stats.append(np.asarray(value))

    def current_epoch(self) -> int:
        counter = self.hparams.get("epoch_counter")
        return counter.current if counter is not None else 0

    def fit(self, epoch_counter, train_set, valid_set=None,
            train_loader_kwargs=None, valid_loader_kwargs=None,
            progressbar=None):
        # fit-scope flag: derived-batch augmentation (frozen-trunk feature
        # cache) only pays off when batches are revisited across epochs;
        # recipes consult this to skip it in single-pass standalone evals
        self._fitting = True
        self.on_fit_start()
        train_loader = self.make_dataloader(
            train_set, Stage.TRAIN, **(train_loader_kwargs or {})
        )
        valid_loader = None
        if valid_set is not None:
            valid_loader = self.make_dataloader(
                valid_set, Stage.VALID, **(valid_loader_kwargs or {})
            )

        from mlvae_tpu.utils.profiling import StepTimer, trace
        profile = bool(self.run_opts.get("profile", False))
        self.step_timer = StepTimer(
            hop_seconds=float(self.hparams.get("hop_length", 20)) / 1000.0
        )

        try:
            self._fit_epochs(epoch_counter, train_loader, valid_loader,
                             profile)
        except BaseException:
            # pending async checkpoint saves must still persist when fit
            # dies mid-run (sync-mode durability); never mask the original
            # failure with a flush error
            try:
                self.on_fit_end()
            except Exception:
                logger.exception("on_fit_end after fit failure")
            raise
        else:
            self.on_fit_end()
        finally:
            self._fitting = False

    def _fit_epochs(self, epoch_counter, train_loader, valid_loader,
                    profile):
        from mlvae_tpu.utils.profiling import trace
        for epoch in epoch_counter:
            self.training = True
            self.on_stage_start(Stage.TRAIN, epoch)
            # the train step DONATES self.params/opt_states/states; an
            # async-checkpoint snapshot still pinning those device buffers
            # would be invalidated by the first dispatch, so block until
            # the save worker has fetched every queued snapshot to host
            # (the D2H DMA started inside save(), and the whole VALID
            # stage has usually passed since — this is normally a no-op)
            if self.checkpointer is not None:
                waiter = getattr(self.checkpointer, "wait_device_release",
                                 None)
                if waiter is not None:
                    waiter()
            self.step_timer.reset()
            t0 = time.time()
            losses = []
            trace_dir = None
            if profile and epoch == 1 and "output_dir" in self.hparams:
                trace_dir = str(Path(self.hparams["output_dir"]) / "profile")
            use_scan = (self.scan_epoch and self.cache_device_batches
                        and not self.debug)
            with trace(trace_dir or ".", enabled=trace_dir is not None):
                if use_scan:
                    self.avg_train_loss, total_audio = \
                        self._fit_epoch_scanned(train_loader)
                else:
                    for i, batch in enumerate(prefetch(train_loader)):
                        self.step_timer.start()
                        losses.append(self.fit_batch(batch))
                        feats, lens = batch["feat"]
                        frames = int(np.round(np.asarray(lens)
                                              * feats.shape[1]).sum())
                        self.step_timer.stop(frames)
                        if self.debug and i + 1 >= self.debug_batches:
                            break
            if not use_scan:
                self.avg_train_loss = float(np.mean(
                    [float(np.asarray(l)) for l in losses]
                )) if losses else 0.0
                total_audio = float(np.sum(self.step_timer.utt_seconds)) \
                    if self.step_timer.utt_seconds else 0.0
            # the loss conversion above is the epoch's device sync point, so
            # wall-clock throughput is computed from the epoch duration (the
            # per-step timer sees only async dispatch now)
            wall = time.time() - t0
            logger.info(
                "epoch %d train: %.4f (%.1fs, %.0f utt-sec/sec)", epoch,
                self.avg_train_loss, wall,
                total_audio / max(wall, 1e-9),
            )
            if profile and "output_dir" in self.hparams:
                # per-epoch p50/p90/compile step timings (--profile)
                self.step_timer.write(
                    Path(self.hparams["output_dir"]) / "step_times.jsonl")
            self.on_stage_end(Stage.TRAIN, self.avg_train_loss, epoch)

            if valid_loader is not None:
                self.training = False
                self.on_stage_start(Stage.VALID, epoch)
                tv = time.time()
                if use_scan:
                    avg = self._eval_epoch_scanned(valid_loader, Stage.VALID)
                else:
                    vlosses = []
                    for i, batch in enumerate(prefetch(valid_loader)):
                        vlosses.append(
                            self.evaluate_batch(batch, Stage.VALID))
                        if self.debug and i + 1 >= self.debug_batches:
                            break
                    avg = float(np.mean(vlosses)) if vlosses else 0.0
                logger.info("epoch %d valid: %.4f (%.1fs)", epoch, avg,
                            time.time() - tv)
                self.on_stage_end(Stage.VALID, avg, epoch)

    def evaluate(self, test_set, max_key=None, min_key=None,
                 test_loader_kwargs=None, progressbar=None):
        t0 = time.time()
        if self.params is None:
            self.init_params()
        self.on_evaluate_start(max_key=max_key, min_key=min_key)
        t_restore = time.time()
        self.training = False
        epoch = self.current_epoch()
        self.on_stage_start(Stage.TEST, epoch)
        loader = self.make_dataloader(
            test_set, Stage.TEST, **(test_loader_kwargs or {})
        )
        if (self.scan_epoch and self.cache_device_batches
                and not self.debug):
            avg = self._eval_epoch_scanned(loader, Stage.TEST)
        else:
            losses = []
            for i, batch in enumerate(prefetch(loader)):
                losses.append(self.evaluate_batch(batch, Stage.TEST))
                if self.debug and i + 1 >= self.debug_batches:
                    break
            avg = float(np.mean(losses)) if losses else 0.0
        t_eval = time.time()
        self.on_stage_end(Stage.TEST, avg, epoch)
        # eval wall-clock breakdown (VERDICT r4 item 8: profile the warm
        # cli.test path): restore = init + best-ckpt recall + state upload;
        # eval = compile (cold) + scan dispatches + host metric loops;
        # write = stats summaries + output files
        logger.info(
            "evaluate timing: restore %.1fs, eval %.1fs, write %.1fs",
            t_restore - t0, t_eval - t_restore, time.time() - t_eval)
        return avg
