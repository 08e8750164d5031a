"""Async checkpointing: device->host fetch + disk write off the training
critical path (``--async_ckpt``).  The reference saves synchronously after
every VALID stage (``md_model.py:151-164``); through a device tunnel that
fetch dominates wall clock for large models (wav2vec2 trunk: GBs/epoch), so
the framework offers a worker-thread saver with supersede-drop — best-by-key
and final checkpoints always persist."""
import threading
import time

import numpy as np
import pytest

from mlvae_tpu.training.checkpointer import Checkpointer


def _state(v):
    return {"params": {"w": np.full((4, 4), float(v), np.float32)}}


def test_async_saves_persist_and_prune_like_sync(tmp_path):
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    # ascending then descending F1: best must survive pruning
    for epoch, f1 in enumerate([10.0, 30.0, 20.0], start=1):
        ck.save_and_keep_only(_state(epoch), meta={"F1": f1, "epoch": epoch},
                              max_keys=["F1"])
    ck.flush()
    best = ck.find_checkpoint(max_key="F1")
    assert best.meta["F1"] == 30.0
    # newest (epoch 3) also kept for resume
    newest = ck.find_checkpoint()
    assert newest.meta["epoch"] == 3
    # restored contents match what was saved
    restored = ck.load_checkpoint(best, templates=_state(0))
    assert restored["params"]["w"][0, 0] == 2.0  # epoch 2 had F1=30


def test_supersede_drop_never_loses_best(tmp_path):
    """Stall the worker so every save queues, then verify the supersede
    logic keeps the best-by-key request even when newer ones arrive."""
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    gate = threading.Event()
    orig = ck._save_and_prune

    def slow(*a):
        gate.wait(timeout=10)
        orig(*a)

    ck._save_and_prune = slow
    ck.save_and_keep_only(_state(1), meta={"F1": 5.0, "epoch": 1},
                          max_keys=["F1"])
    time.sleep(0.2)  # let the worker pick up save 1 (now in flight)
    # queue three more: epoch 2 is the best -> must persist; epoch 3 is
    # dominated by 2 and superseded by 4 -> droppable
    ck.save_and_keep_only(_state(2), meta={"F1": 50.0, "epoch": 2},
                          max_keys=["F1"])
    ck.save_and_keep_only(_state(3), meta={"F1": 7.0, "epoch": 3},
                          max_keys=["F1"])
    ck.save_and_keep_only(_state(4), meta={"F1": 6.0, "epoch": 4},
                          max_keys=["F1"])
    with ck._cv:
        queued_epochs = [m["epoch"] for (_, m, *_r) in ck._queue]
    assert 2 in queued_epochs          # best-by-key kept
    assert 3 not in queued_epochs      # dominated + superseded -> dropped
    assert queued_epochs[-1] == 4      # latest request always queued
    gate.set()
    ck.flush()
    assert ck.find_checkpoint(max_key="F1").meta["F1"] == 50.0
    assert ck.find_checkpoint().meta["epoch"] == 4  # newest kept


def test_no_keys_supersede_drops_intermediates(tmp_path):
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    gate = threading.Event()
    orig = ck._save_and_prune
    ck._save_and_prune = lambda *a: (gate.wait(timeout=10), orig(*a))
    for epoch in range(1, 5):
        ck.save_and_keep_only(_state(epoch), meta={"epoch": epoch})
    with ck._cv:
        queued_epochs = [m["epoch"] for (_, m, *_r) in ck._queue]
    # keyless saves: only the newest queued request matters
    assert queued_epochs[-1] == 4 and len(queued_epochs) <= 2
    gate.set()
    ck.flush()
    assert ck.find_checkpoint().meta["epoch"] == 4


def test_worker_error_surfaces_on_flush(tmp_path):
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    ck._save_and_prune = lambda *a: (_ for _ in ()).throw(
        OSError("disk full"))
    ck.save_and_keep_only(_state(1), meta={"epoch": 1})
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        ck.flush()


def test_find_checkpoint_drains_pending(tmp_path):
    """evaluate-time recall must see saves still in the queue."""
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    ck.save_and_keep_only(_state(1), meta={"F1": 9.0, "epoch": 1},
                          max_keys=["F1"])
    # no explicit flush: find_checkpoint itself must drain
    assert ck.find_checkpoint(max_key="F1").meta["epoch"] == 1


def test_run_opt_enables_async(tmp_path):
    from mlvae_tpu.cli.args import parse_arguments
    _, run_opts, _ = parse_arguments(
        ["cfg.yaml", "--async_ckpt", "True"])
    assert run_opts["async_ckpt"] is True
    from mlvae_tpu.training.brain import Brain
    ck = Checkpointer(tmp_path / "ckpts")
    assert ck.async_save is False
    Brain(modules={}, hparams={}, run_opts=run_opts, checkpointer=ck)
    assert ck.async_save is True


def test_drop_survives_superseder_failure(tmp_path):
    """A save dropped because a newer queued request superseded it must be
    re-enqueued (and persist) if that newer save then fails on disk —
    async must never lose a state sync mode would have written."""
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    gate = threading.Event()
    orig = ck._save_and_prune

    def failing(state, meta, *rest):
        gate.wait(timeout=10)
        if meta.get("epoch") == 3:
            raise OSError("disk full")
        orig(state, meta, *rest)

    ck._save_and_prune = failing
    ck.save_and_keep_only(_state(1), meta={"F1": 5.0, "epoch": 1},
                          max_keys=["F1"])
    time.sleep(0.2)  # worker picks up save 1 (stalled at the gate)
    ck.save_and_keep_only(_state(2), meta={"F1": 40.0, "epoch": 2},
                          max_keys=["F1"])
    # epoch 3 beats 2 -> 2 is supersede-dropped (held, not discarded)
    ck.save_and_keep_only(_state(3), meta={"F1": 50.0, "epoch": 3},
                          max_keys=["F1"])
    with ck._cv:
        assert [m["epoch"] for (_, m, *_r) in ck._queue] == [3]
        assert [m["epoch"] for (_, m, *_r) in ck._dropped] == [2]
    gate.set()
    # epoch 3's write fails -> epoch 2 must be re-enqueued and persisted
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        ck.flush()
    best = ck.find_checkpoint(max_key="F1")
    assert best.meta["epoch"] == 2 and best.meta["F1"] == 40.0


def test_held_drops_are_staged_to_host(tmp_path):
    """Supersede-dropped saves can linger until their superseder persists,
    so they must hold host numpy arrays, never device buffers (HBM)."""
    import jax
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    gate = threading.Event()
    orig = ck._save_and_prune
    ck._save_and_prune = lambda *a: (gate.wait(timeout=10), orig(*a))
    dev = lambda e: {"params": {"w": jax.numpy.full((4, 4), float(e))}}
    ck.save_and_keep_only(dev(1), meta={"F1": 5.0, "epoch": 1},
                          max_keys=["F1"])
    time.sleep(0.2)
    ck.save_and_keep_only(dev(2), meta={"F1": 7.0, "epoch": 2},
                          max_keys=["F1"])
    ck.save_and_keep_only(dev(3), meta={"F1": 50.0, "epoch": 3},
                          max_keys=["F1"])  # supersedes epoch 2
    with ck._cv:
        dropped_leaves = [leaf for (s, *_r) in ck._dropped
                          for leaf in jax.tree_util.tree_leaves(s)]
    assert dropped_leaves and all(
        isinstance(l, np.ndarray) for l in dropped_leaves)
    gate.set()
    ck.flush()


def test_backpressure_bounds_queue_depth(tmp_path):
    """With the worker stalled and every queued save best-by-key-protected,
    a third enqueue must block (HBM pinning bound) until the worker makes
    progress, then complete."""
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    gate = threading.Event()
    orig = ck._save_and_prune
    ck._save_and_prune = lambda *a: (gate.wait(timeout=10), orig(*a))
    # one metric key per save: no save can ever be superseded, so the drop
    # pass cannot shrink the queue and only backpressure bounds it
    for e in (1, 2, 3):
        ck.save_and_keep_only(_state(e), meta={f"m{e}": 1.0, "epoch": e},
                              max_keys=[f"m{e}"])
        if e == 1:
            time.sleep(0.2)  # worker picks up save 1 (stalled)
    done = threading.Event()

    def fourth():
        ck.save_and_keep_only(_state(4), meta={"m4": 1.0, "epoch": 4},
                              max_keys=["m4"])
        done.set()

    t = threading.Thread(target=fourth, daemon=True)
    t.start()
    assert not done.wait(timeout=0.5), "4th enqueue should block at depth 2"
    gate.set()
    assert done.wait(timeout=10), "enqueue must complete once worker drains"
    ck.flush()
    # pruning uses only each request's own keys (SpeechBrain parity), so
    # every later save prunes the earlier ones: newest survives
    assert [c.meta["epoch"] for c in ck.list_checkpoints()] == [4]


def test_close_stops_worker_and_stays_usable(tmp_path):
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    ck.save_and_keep_only(_state(1), meta={"epoch": 1})
    ck.close()
    assert ck._worker is None or not ck._worker.is_alive()
    assert ck.find_checkpoint().meta["epoch"] == 1
    # still usable after close: a new async save restarts the worker
    ck.save_and_keep_only(_state(2), meta={"epoch": 2})
    ck.flush()
    assert ck.find_checkpoint().meta["epoch"] == 2
    ck.close()


def test_list_checkpoints_skips_torn_entries(tmp_path):
    """A killed process can leave a checkpoint dir without (or with a
    partial) meta.json; enumeration must skip it, not crash."""
    ck = Checkpointer(tmp_path / "ckpts")
    ck.save_and_keep_only(_state(1), meta={"epoch": 1})
    torn = tmp_path / "ckpts" / "CKPT-torn"
    torn.mkdir()
    (torn / "params.npz").write_bytes(b"partial")
    torn2 = tmp_path / "ckpts" / "CKPT-torn2"
    torn2.mkdir()
    (torn2 / "meta.json").write_text("{invalid json")
    assert [c.meta["epoch"] for c in ck.list_checkpoints()] == [1]


def _jax_state(v):
    import jax.numpy as jnp
    return {"params": {"w": jnp.full((4, 4), float(v), jnp.float32)}}


def test_wait_device_release_unblocks_donating_steps(tmp_path):
    """The Brain's donating train step must be able to wait until no queued
    async snapshot still references device buffers (donating a buffer a
    snapshot holds would invalidate the snapshot).  After
    wait_device_release returns, the pin count is zero and a save of the
    SAME arrays that were since donated/deleted can no longer crash the
    worker (it already holds host copies)."""
    import jax
    import jax.numpy as jnp

    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    state = _jax_state(1)
    ck.save_and_keep_only(state, meta={"F1": 10.0, "epoch": 1},
                          max_keys=["F1"])
    ck.wait_device_release()
    assert ck._device_pinned == 0
    # simulate the donation: delete the snapshot's device buffers
    state["params"]["w"].delete()
    ck.flush()  # worker must finish from its host copy, not the dead array
    best = ck.find_checkpoint(max_key="F1")
    assert best is not None and best.meta["F1"] == 10.0
    restored = ck.load_checkpoint(best, templates=_state(0))
    assert restored["params"]["w"][0, 0] == 1.0
    ck.close()


def test_wait_device_release_noop_without_worker(tmp_path):
    ck = Checkpointer(tmp_path / "ckpts", async_save=False)
    ck.wait_device_release()  # must not raise or hang
    ck.save_and_keep_only(_state(1), meta={"epoch": 1})
    ck.wait_device_release()
    assert ck.find_checkpoint() is not None


def test_host_state_saves_keep_pin_accounting_balanced(tmp_path):
    """Re-enqueued/host-side snapshots must not decrement the device-pin
    count below zero (a negative count would let a later donating epoch
    skip a genuine wait)."""
    ck = Checkpointer(tmp_path / "ckpts", async_save=True)
    for epoch in (1, 2, 3):
        ck.save_and_keep_only(_state(epoch), meta={"epoch": epoch})
    ck.flush()
    assert ck._device_pinned == 0
    ck.save_and_keep_only(_jax_state(4), meta={"epoch": 4})
    ck.wait_device_release()
    assert ck._device_pinned == 0
    ck.close()


def test_metric_tie_breaks_to_newest(tmp_path):
    """Equal selection metrics (degenerate training pinned at a base-rate
    pole) must select and retain the NEWEST tied checkpoint, not the
    epoch-1 save (which would evaluate a nearly untrained model and trip
    the stale-checkpoint guard)."""
    ck = Checkpointer(tmp_path / "ckpts")
    for epoch in (1, 2, 3):
        ck.save_and_keep_only(
            _state(epoch), meta={"F1": 35.85, "loss": 3.0, "epoch": epoch},
            max_keys=["F1"], num_to_keep=1)
    best = ck.find_checkpoint(max_key="F1")
    assert best.meta["epoch"] == 3, best.meta
    worst = ck.find_checkpoint(min_key="loss")
    assert worst.meta["epoch"] == 3, worst.meta
    # retention also kept the newest tied save
    kept = [c.meta["epoch"] for c in ck.list_checkpoints()]
    assert 3 in kept and 1 not in kept, kept
