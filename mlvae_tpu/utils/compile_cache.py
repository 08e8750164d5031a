"""Persistent XLA compilation-cache setup.

Every entry point pays XLA compilation for each (step, batch-signature,
scan-run-length) program it touches; on the real chip a fused train-step
compile costs 20-40 s.  The programs are identical across processes — a
``cli.test`` run recompiles exactly the eval scans the preceding
``cli.train`` already built, and the driver's ``bench.py`` recompiles the
same step every round.  JAX's persistent compilation cache de-duplicates
them on disk: measured on this setup a 155 s cold compile+run becomes
6.7 s when served from the cache.

The reference has no counterpart (eager PyTorch pays no compile), so this
is pure TPU-framework plumbing: enabled by default by the CLI driver and
``bench.py``; opt out with ``--compile_cache False`` or
``MLVAE_COMPILE_CACHE=0``.
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_DEFAULT_DIR = "~/.cache/mlvae_tpu/xla_cache"


def _repair_orphans(cache_path: Path) -> None:
    """Drop ``*-cache`` entries missing their ``*-atime`` sidecar.

    jax's size-bounded LRU cache writes the entry then the sidecar under a
    file lock; a process killed between the two leaves an orphan.  Its
    eviction pass (``jax._src.lru_cache.LRUCache._evict_if_needed``) then
    reads the sidecar of EVERY entry, so one orphan makes every future
    ``put`` in every process fail with FileNotFoundError — the cache stops
    accruing entries forever.  The orphaned entry itself may be a torn
    write, so delete it rather than fabricate a sidecar."""
    try:
        lock = None
        try:
            import filelock

            lock = filelock.FileLock(str(cache_path / ".lockfile"))
            lock.acquire(timeout=5)
        except ImportError:
            lock = None  # no filelock available: lone-process best effort
        except Exception:
            # another process holds the lock (likely mid-put: entry written,
            # sidecar pending) — sweeping unlocked could delete its healthy
            # entry.  Skip; the next process to start will sweep.
            logger.info("compile-cache busy; skipping orphan sweep")
            return
        try:
            for entry in cache_path.glob("*-cache"):
                sidecar = cache_path / (entry.name[:-len("-cache")] + "-atime")
                if not sidecar.exists():
                    logger.warning(
                        "removing torn compile-cache entry %s", entry.name)
                    entry.unlink(missing_ok=True)
        finally:
            if lock is not None:
                lock.release()
    except Exception as e:
        logger.warning("compile-cache orphan sweep failed: %s", e)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (default
    ``~/.cache/mlvae_tpu/xla_cache``; ``MLVAE_COMPILE_CACHE_DIR`` overrides).
    Returns the directory used, or None when disabled via
    ``MLVAE_COMPILE_CACHE=0``.  Safe to call more than once."""
    if os.environ.get("MLVAE_COMPILE_CACHE", "1").lower() in ("0", "false"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("MLVAE_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    cache_dir = str(Path(cache_dir).expanduser())
    try:
        import jax

        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        _repair_orphans(Path(cache_dir))
        # the default 1 s floor skips exactly the small-but-many programs
        # (per-shape eval steps, short scans) this framework produces
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # LRU-bounded on disk (the per-shape/per-run-length program set
        # grows with every new corpus geometry; unbounded is a disk leak)
        jax.config.update("jax_compilation_cache_max_size",
                          int(os.environ.get("MLVAE_COMPILE_CACHE_MAX_MB",
                                             "4096")) * 1024 * 1024)
        # set the directory LAST: if any knob above is missing on this jax
        # version we bail with the cache fully disabled, never half-enabled
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # jax initializes its cache object on first use and then ignores
        # config changes; reset so this dir takes effect even when a
        # compile already happened in this process
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:
            pass
    except Exception as e:  # never let cache plumbing break an entry point
        logger.warning("persistent compile cache unavailable: %s", e)
        return None
    logger.info("persistent XLA compile cache at %s", cache_dir)
    return cache_dir
