"""Metric-keyed checkpointing of training state pytrees.

Capability parity with SpeechBrain's ``Checkpointer`` as the reference uses
it: ``save_and_keep_only(meta=..., max_keys=..., min_keys=...)`` after every
VALID stage (reference ``models/md_model.py:151-164``) and best-checkpoint
recall by key at evaluate time.  YAML-visible as
``!new:speechbrain.utils.checkpoints.Checkpointer``.

Storage is one directory per checkpoint holding a ``meta.json`` and one
``.npz`` of path-flattened arrays per recoverable pytree — plain files, no
framework-specific serialization, loadable from any host.
"""
from __future__ import annotations

import atexit
import functools
import json
import logging
import os
import shutil
import threading
import time
import weakref
from collections import deque
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import jax

logger = logging.getLogger(__name__)


def _holds_device_arrays(state) -> bool:
    """True if any leaf is a live jax.Array (i.e. the snapshot still pins
    device buffers).  Host trees (numpy, re-enqueued fetched snapshots)
    return False so the device-pin accounting stays balanced."""
    return any(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(state))


def _leaf_device_bytes(leaf) -> int:
    """PER-DEVICE bytes a leaf pins: for sharded arrays the shard size, not
    the global ``nbytes`` (which over-counted on multi-chip meshes and
    could wrongly engage the single-queued-snapshot bound — r4 advisor
    finding)."""
    nbytes = getattr(leaf, "nbytes", 0)
    sharding = getattr(leaf, "sharding", None)
    if sharding is not None and nbytes:
        try:
            shard_shape = sharding.shard_shape(leaf.shape)
            return int(np.prod(shard_shape)) * leaf.dtype.itemsize
        except Exception:
            pass
    return nbytes


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


class CheckpointKeyMismatch(ValueError):
    """The saved pytree's key paths don't match the current template — the
    state LAYOUT changed since the checkpoint was written (e.g. optimizer
    states moved to one-state-per-module).  Distinct from a shape mismatch,
    which means the ARCHITECTURE changed."""

    def __init__(self, missing, rec_name: str = "?"):
        self.missing = list(missing)
        self.rec_name = rec_name
        super().__init__(
            f"checkpoint layout mismatch for recoverable {rec_name!r}: "
            f"{len(self.missing)} template key(s) absent from the saved "
            f"file, e.g. {self.missing[:3]}")


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    missing = [jax.tree_util.keystr(p) for p, _ in leaves_with_path
               if jax.tree_util.keystr(p) not in flat]
    if missing:
        raise CheckpointKeyMismatch(missing)
    new_leaves = []
    for path, leaf in leaves_with_path:
        key = jax.tree_util.keystr(path)
        arr = flat[key]
        cur = np.asarray(leaf)
        if arr.shape != cur.shape:
            raise ValueError(
                f"checkpoint/model shape mismatch at {key}: saved "
                f"{arr.shape}, current model expects {cur.shape} — the "
                "model architecture changed since this checkpoint was "
                "written (e.g. a pretrained snapshot now overrides the "
                "configured sizes); delete the stale checkpoints or match "
                "the original configuration")
        new_leaves.append(arr.astype(cur.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class Checkpoint:
    def __init__(self, path: Path, meta: Dict[str, Any]):
        self.path = Path(path)
        self.meta = meta


class Checkpointer:
    """Metric-keyed checkpointing (parity with SpeechBrain's Checkpointer,
    reference ``md_model.py:151-164``).

    Two storage backends behind the same directory layout (one dir per
    checkpoint with ``meta.json`` + one blob per recoverable):

    * ``npz`` (default) — flat numpy archives; dependency-free, greppable.
    * ``orbax`` — ``orbax.checkpoint`` PyTree handlers (the JAX-ecosystem
      standard; on multi-host TPU pods orbax handles per-host sharded
      save/restore, which npz cannot).  Select with ``backend='orbax'`` in
      the YAML or constructor.
    """

    def __init__(self, checkpoints_dir, recoverables: Optional[Dict] = None,
                 backend: str = "npz", async_save: bool = False, **kwargs):
        self.checkpoints_dir = Path(checkpoints_dir)
        if backend not in ("npz", "orbax"):
            raise ValueError(f"unknown checkpoint backend: {backend!r} "
                             "(expected 'npz' or 'orbax')")
        self.backend = backend
        # YAML-declared recoverables (module specs) are kept for parity and
        # introspection; live state pytrees are supplied by the Brain.
        self.recoverables = dict(recoverables or {})
        # async mode: device->host fetch + disk write happen on a worker
        # thread, off the training critical path (see save_and_keep_only)
        self.async_save = bool(async_save)
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._worker: Optional[threading.Thread] = None
        self._worker_error: Optional[BaseException] = None
        self._inflight_meta: Optional[Dict[str, Any]] = None
        # supersede-dropped requests, held (host RAM) until the newer save
        # that justified each drop has durably persisted; re-enqueued if the
        # worker's save fails, so async never loses a state sync would have
        # written (review finding: drop-then-superseder-fails)
        self._dropped: List[tuple] = []
        # queued/in-flight snapshots whose DEVICE buffers are still live
        # (the worker decrements after its device->host fetch); the Brain's
        # donating train step waits on this via wait_device_release()
        self._device_pinned = 0
        self._closed = False
        self._atexit_cb = None

    def add_recoverable(self, name: str, obj):
        self.recoverables[name] = obj

    # -- enumeration -------------------------------------------------------------
    def list_checkpoints(self) -> List[Checkpoint]:
        out = []
        if not self.checkpoints_dir.exists():
            return out
        for d in sorted(self.checkpoints_dir.iterdir()):
            meta_path = d / "meta.json"
            try:
                if d.is_dir() and meta_path.exists():
                    with open(meta_path) as f:
                        out.append(Checkpoint(d, json.load(f)))
            except (FileNotFoundError, NotADirectoryError,
                    json.JSONDecodeError):
                # pruned concurrently by the async worker, or a torn entry
                # left by a killed process (meta.json is written via atomic
                # rename, so a live writer can never produce a torn read)
                continue
        return out

    def find_checkpoint(self, max_key: Optional[str] = None,
                        min_key: Optional[str] = None) -> Optional[Checkpoint]:
        self.flush()  # selection must see every pending async save
        # set when a requested selection key was absent from every meta and
        # the newest checkpoint was returned instead; callers (Brain.
        # on_evaluate_start) escalate this to an error unless explicitly
        # allowed, so a failed training run can't quietly feed evaluation
        self.last_selection_fell_back = False
        ckpts = self.list_checkpoints()
        if not ckpts:
            return None
        newest = max(ckpts, key=lambda c: c.meta.get("unixtime", 0))
        # When the requested key exists in NO checkpoint meta (e.g. a recipe
        # selecting on a metric it never emits, reference
        # HMM_DNN_ALI/model.yaml:13), returning None would make evaluate()
        # silently run freshly-initialized weights.  Fall back to the newest
        # checkpoint instead, loudly.
        # Ties on the metric break toward the NEWEST checkpoint: degenerate
        # training (e.g. a selection metric pinned at a base-rate pole)
        # otherwise yields the epoch-1 save as "best", which both evaluates
        # a nearly untrained model and trips the stale-checkpoint guard
        # (observed: w2v_CRDNN_CTC, plvl_md.F1 identical every epoch).
        if max_key:
            keyed = [c for c in ckpts if max_key in c.meta]
            if keyed:
                return max(keyed, key=lambda c: (c.meta[max_key],
                                                 c.meta.get("unixtime", 0)))
        elif min_key:
            keyed = [c for c in ckpts if min_key in c.meta]
            if keyed:
                return min(keyed, key=lambda c: (c.meta[min_key],
                                                 -c.meta.get("unixtime", 0)))
        else:
            return newest
        import warnings
        warnings.warn(
            f"no checkpoint meta contains the selection key "
            f"{max_key or min_key!r}; falling back to the newest checkpoint "
            f"({newest.path.name})")
        self.last_selection_fell_back = True
        return newest

    # -- save ---------------------------------------------------------------------
    def save_checkpoint(self, state: Dict[str, Any],
                        meta: Optional[Dict[str, Any]] = None) -> Checkpoint:
        meta = dict(meta or {})
        meta.setdefault("unixtime", time.time())
        name = f"CKPT-{time.strftime('%Y-%m-%d_%H-%M-%S')}-{int(time.time()*1e6)%1000000:06d}"
        path = self.checkpoints_dir / name
        path.mkdir(parents=True, exist_ok=True)
        # one batched device->host fetch for the whole state tree (per-leaf
        # np.asarray would serialize one transfer round trip per array)
        state = jax.device_get(state)
        for rec_name, tree in state.items():
            if self.backend == "orbax":
                import orbax.checkpoint as ocp
                with ocp.PyTreeCheckpointer() as ckpter:
                    ckpter.save((path / f"{rec_name}.orbax").resolve(), tree)
            else:
                np.savez(path / f"{rec_name}.npz", **_flatten(tree))
        # meta.json is the completeness marker (written last, after every
        # blob) and must appear atomically: concurrent list_checkpoints()
        # from the training thread must see either nothing or valid JSON
        tmp = path / "meta.json.tmp"
        with open(tmp, "w") as f:
            json.dump(_jsonable(meta), f, indent=2)
        os.replace(tmp, path / "meta.json")
        return Checkpoint(path, meta)

    def save_and_keep_only(self, state: Dict[str, Any],
                           meta: Optional[Dict[str, Any]] = None,
                           max_keys: Optional[List[str]] = None,
                           min_keys: Optional[List[str]] = None,
                           num_to_keep: int = 1,
                           keep_recent: bool = True):
        """Save, then delete every checkpoint that is neither among the best
        ``num_to_keep`` under any of the given keys nor (with
        ``keep_recent``, SpeechBrain's default) the newest — the newest is
        what fit-resume restarts from.

        With ``async_save`` the device->host copy is *initiated* here
        (``copy_to_host_async`` per leaf, non-blocking) and completed on the
        worker thread, which then writes to disk — training continues
        immediately.  The snapshot's old device buffers stay alive only
        until the worker's fetch completes, and enqueueing blocks when two
        saves are already outstanding, so device HBM holds at most ~2 extra
        snapshots (the same bound orbax's async checkpointing gives).  A
        queued save that a newer request supersedes is skipped UNLESS it is
        (provably) among the best ``num_to_keep`` under one of its metric
        keys; a skipped save is fetched to host and *held* until the newer
        saves that justified the skip have durably persisted, and is
        re-enqueued if a worker save fails — so async never loses a state
        sync mode would have written.  Best-by-key checkpoints always
        persist, and the final save of a fit always persists (``flush`` at
        fit end).  The tradeoff is mid-run crash-resume granularity plus
        host RAM for at most a few staged snapshots, not durability or
        selection correctness."""
        meta = dict(meta or {})
        meta.setdefault("unixtime", time.time())
        if not self.async_save:
            self._save_and_prune(state, meta, max_keys, min_keys,
                                 num_to_keep, keep_recent)
            return
        self._raise_worker_error()
        # kick off the D2H DMA now (non-blocking); the worker's device_get
        # then completes quickly, and the copy overlaps training
        for leaf in jax.tree_util.tree_leaves(state):
            start_async = getattr(leaf, "copy_to_host_async", None)
            if start_async is not None:
                try:
                    start_async()
                except Exception:  # plugin backends may not support it
                    pass
        with self._cv:
            if self._queue:
                # supersede: set aside queued saves that can no longer be
                # kept once the newer requests persist (held in _dropped
                # until that durably happens — see _worker_main)
                known = [m for (_, m, *_rest) in self._queue] + [meta]
                inflight_t = None
                if self._inflight_meta is not None:
                    known.append(self._inflight_meta)
                    inflight_t = self._inflight_meta.get("unixtime")
                # skip the in-flight save's own on-disk meta (its write may
                # already have landed) so it isn't counted twice as "better"
                known += [c.meta for c in self.list_checkpoints()
                          if inflight_t is None
                          or c.meta.get("unixtime") != inflight_t]
                new_queue: deque = deque()
                for item in self._queue:
                    if self._possibly_kept(item[1], item[2], item[3],
                                           item[4], known):
                        new_queue.append(item)
                    else:
                        # held items can linger, so release their device
                        # buffers now (the async copy above makes this a
                        # near-complete DMA, not a fresh synchronous fetch)
                        if _holds_device_arrays(item[0]):
                            self._device_pinned -= 1
                            self._cv.notify_all()
                        self._dropped.append(
                            (jax.device_get(item[0]),) + item[1:])
                self._queue = new_queue
            # backpressure: every queued snapshot pins its device buffers
            # until the worker's fetch completes, so bound the queue depth
            # (rare: only bites when saves are slower than epochs AND the
            # queued saves are all best-by-key-protected from the drop pass).
            # Large states (w2v scale: a snapshot is several GiB of HBM)
            # drop the bound to ONE queued snapshot — pinning two 3.8 GiB
            # state copies beside the resident training state is part of
            # what RESOURCE_EXHAUSTED'd the r3b/r4 cnncl runs.  Threshold
            # override: MLVAE_ASYNC_CKPT_TIGHT_BYTES (default 1 GiB).
            snap_bytes = sum(
                _leaf_device_bytes(leaf)
                for leaf in jax.tree_util.tree_leaves(state))
            tight_at = int(os.environ.get(
                "MLVAE_ASYNC_CKPT_TIGHT_BYTES", 1 << 30))
            depth = 1 if snap_bytes > tight_at else 2
            while len(self._queue) >= depth and self._worker_error is None:
                self._cv.wait()
            self._queue.append(
                (state, meta, max_keys, min_keys, num_to_keep, keep_recent))
            if _holds_device_arrays(state):
                self._device_pinned += 1
            self._ensure_worker()
            self._cv.notify_all()

    def wait_device_release(self):
        """Block until no queued or in-flight async snapshot still holds
        DEVICE buffers (the worker fetches each snapshot to host before
        writing).  The Brain calls this before a train epoch whose steps
        donate ``self.params``/``opt_states``/``states``: donating a buffer
        a snapshot still references would invalidate the snapshot.  The
        D2H DMA was kicked off inside ``save()`` and a whole VALID stage
        normally runs in between, so this is almost always a no-op."""
        if self._worker is None:
            return
        with self._cv:
            while self._device_pinned > 0 and self._worker_error is None:
                self._cv.wait()
        self._raise_worker_error()

    @staticmethod
    def _possibly_kept(meta, max_keys, min_keys, num_to_keep, known) -> bool:
        """Could a save with this meta still be retained once the newer
        requests in ``known`` have persisted?  Conservative: True unless
        ``num_to_keep`` strictly-better metas exist under EVERY key."""
        for key, better in ([(k, lambda a, b: a > b) for k in max_keys or []]
                            + [(k, lambda a, b: a < b)
                               for k in min_keys or []]):
            if key not in meta:
                continue
            n_better = sum(1 for m in known
                           if m is not meta and key in m
                           and better(m[key], meta[key]))
            if n_better < num_to_keep:
                return True
        return False

    def _save_and_prune(self, state, meta, max_keys, min_keys,
                        num_to_keep, keep_recent):
        self.save_checkpoint(state, meta)
        keep = set()
        ckpts = self.list_checkpoints()
        # same tie-to-newest rule as find_checkpoint, so the checkpoint
        # retention and the evaluate-time recall agree on which tied save
        # is "best"
        for key in max_keys or []:
            ranked = sorted([c for c in ckpts if key in c.meta],
                            key=lambda c: (c.meta[key],
                                           c.meta.get("unixtime", 0)),
                            reverse=True)
            keep.update(str(c.path) for c in ranked[:num_to_keep])
        for key in min_keys or []:
            ranked = sorted([c for c in ckpts if key in c.meta],
                            key=lambda c: (c.meta[key],
                                           -c.meta.get("unixtime", 0)))
            keep.update(str(c.path) for c in ranked[:num_to_keep])
        if keep_recent or not keep:
            newest = max(ckpts, key=lambda c: c.meta.get("unixtime", 0))
            keep.add(str(newest.path))
        for c in ckpts:
            if str(c.path) not in keep:
                shutil.rmtree(c.path, ignore_errors=True)

    # -- async worker -------------------------------------------------------------
    def _ensure_worker(self):
        if self._worker is None or not self._worker.is_alive():
            # the thread and the atexit hook hold only a weakref: an
            # abandoned Checkpointer stays collectable, and its worker
            # exits on the next poll once the instance is gone (or after
            # close())
            ref = weakref.ref(self)
            self._worker = threading.Thread(
                target=_worker_main, args=(ref,), daemon=True,
                name="mlvae-ckpt")
            self._worker.start()
            if self._atexit_cb is None:
                self._atexit_cb = functools.partial(_flush_at_exit, ref)
                atexit.register(self._atexit_cb)

    def flush(self):
        """Block until every queued async save has persisted; re-raise any
        worker failure.  No-op in sync mode."""
        if self._worker is not None:
            with self._cv:
                while True:
                    while self._queue or self._inflight_meta is not None:
                        self._cv.wait()
                    if self._dropped and self._worker_error is None:
                        # safety net: anything still held (its superseding
                        # save never durably justified the drop, e.g. it
                        # was itself pruned in a metric tie) persists now
                        self._queue.extend(self._dropped)
                        self._dropped = []
                        self._cv.notify_all()
                        continue
                    break
        self._raise_worker_error()

    def close(self):
        """Flush pending saves, stop the worker thread, and drop the atexit
        registration.  Idempotent; the Checkpointer stays usable in sync
        mode afterwards (a later async save restarts the worker)."""
        try:
            self.flush()
        finally:
            with self._cv:
                self._closed = True
                self._cv.notify_all()
            if self._atexit_cb is not None:
                atexit.unregister(self._atexit_cb)
                self._atexit_cb = None
            if self._worker is not None:
                self._worker.join(timeout=5)
                self._worker = None
            self._closed = False

    def _flush_best_effort(self):
        try:
            self.flush()
        except BaseException as e:
            logger.error("checkpoint flush at exit failed: %s", e)

    def _raise_worker_error(self):
        with self._cv:
            err, self._worker_error = self._worker_error, None
        if err is not None:
            raise RuntimeError("async checkpoint save failed") from err

    # -- load --------------------------------------------------------------------
    def load_checkpoint(self, ckpt: Checkpoint,
                        templates: Dict[str, Any]) -> Dict[str, Any]:
        """Restore state pytrees shaped like ``templates``."""
        out = {}
        for rec_name, template in templates.items():
            orbax_path = ckpt.path / f"{rec_name}.orbax"
            npz_path = ckpt.path / f"{rec_name}.npz"
            try:
                if orbax_path.exists():
                    import orbax.checkpoint as ocp
                    with ocp.PyTreeCheckpointer() as ckpter:
                        restored = ckpter.restore(orbax_path.resolve())
                    out[rec_name] = _unflatten_like(
                        template, {jax.tree_util.keystr(p): np.asarray(v)
                                   for p, v in
                                   jax.tree_util.tree_flatten_with_path(
                                       restored)[0]})
                elif npz_path.exists():
                    with np.load(npz_path, allow_pickle=False) as data:
                        flat = {k: data[k] for k in data.files}
                    out[rec_name] = _unflatten_like(template, flat)
            except CheckpointKeyMismatch as e:
                e.rec_name = rec_name
                raise CheckpointKeyMismatch(e.missing, rec_name) from None
        return out

    def recover_if_possible(self, templates: Dict[str, Any],
                            max_key: Optional[str] = None,
                            min_key: Optional[str] = None):
        ckpt = self.find_checkpoint(max_key=max_key, min_key=min_key)
        if ckpt is None:
            return None, None
        return self.load_checkpoint(ckpt, templates), ckpt


def _worker_main(ref: "weakref.ref[Checkpointer]"):
    """Async save worker.  Holds only a weakref to the Checkpointer so the
    instance can be garbage-collected; polls with a timeout and exits when
    the owner is gone or closed with an empty queue."""
    while True:
        self = ref()
        if self is None:
            return
        cv = self._cv
        with cv:
            if not self._queue:
                if self._closed:
                    return
                del self  # don't pin the instance while parked
                cv.wait(timeout=0.5)
                continue
            item = self._queue.popleft()
            self._inflight_meta = item[1]
            cv.notify_all()  # unblock backpressured enqueuers promptly
        try:
            # fetch to host FIRST (completes the async D2H started in
            # save()), then release the device buffers: from here on the
            # snapshot holds no HBM, and a donating train step waiting in
            # wait_device_release() may proceed while the disk write runs
            if _holds_device_arrays(item[0]):
                try:
                    item = (jax.device_get(item[0]),) + item[1:]
                finally:
                    with cv:
                        self._device_pinned -= 1
                        cv.notify_all()
            self._save_and_prune(*item)
            if self._dropped:
                # a held drop becomes final only once the persisted
                # checkpoints alone justify it; until then keep holding
                disk = [c.meta for c in self.list_checkpoints()]
                with cv:
                    self._dropped = [
                        d for d in self._dropped
                        if self._possibly_kept(d[1], d[2], d[3], d[4], disk)]
        except BaseException as e:  # surfaced on next flush/save
            logger.error("async checkpoint save failed: %s", e)
            with cv:
                self._worker_error = e
                if self._dropped:
                    # the failed save may have been the justification for
                    # these drops — save them after all (sync-mode
                    # durability: the previous best always persists)
                    self._queue.extendleft(reversed(self._dropped))
                    self._dropped = []
        finally:
            with cv:
                self._inflight_meta = None
                cv.notify_all()


def _flush_at_exit(ref: "weakref.ref[Checkpointer]"):
    self = ref()
    if self is not None:
        self._flush_best_effort()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def checkpoint_has(ckpt: Checkpoint, rec_name: str) -> bool:
    """True if the checkpoint stores ``rec_name`` under either backend."""
    return ((ckpt.path / f"{rec_name}.npz").exists()
            or (ckpt.path / f"{rec_name}.orbax").exists())
