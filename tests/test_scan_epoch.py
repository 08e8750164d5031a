"""Epoch-in-jit (`--scan_epoch`): lax.scan over stacked device batches must
produce EXACTLY the same parameters, losses, and rng state as the per-batch
loop — same batch order, same rng split sequence, same step function."""
import numpy as np

import jax
import jax.numpy as jnp

from mlvae_tpu.bench_utils import build_md_vae, synth_batch
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.training.brain import Stage


class _FakeLoader:
    """Yields pre-built PaddedBatch-like dicts in a fixed order."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


class _FakeBatch(dict):
    def __init__(self, data, ids):
        super().__init__(data)
        self.ids = ids
        self["id"] = ids

    def keys(self):
        return [k for k in super().keys() if k != "id"]


# shrunken sizes: the parity logic (run grouping, rng sequencing, stack
# cache, cond-free scan) is size-independent; reference sizes only inflate
# CPU compile time (~3 min/test)
SMALL = {
    "phn_rnn_hidden_size": 64, "boundary_rnn_hidden_size": 64,
    "rnn_hidden_size": 64, "dec_rnn_hidden_size": 64,
    "phn_rnn_num_layers": 1, "boundary_rnn_num_layers": 1,
    "rnn_num_layers": 1, "dec_rnn_num_layers": 1,
}


def _small_md_vae(batch_size=8):
    return build_md_vae(batch_size=batch_size, overrides=dict(SMALL))


def _batches():
    out = []
    # two shape groups: 3 batches of T=32 then 2 of T=48 (duration-sorted
    # loaders produce exactly this run structure)
    for i, T in enumerate([32, 32, 32, 48, 48]):
        b = synth_batch(batch_size=8, T=T, L=4, seed=100 + i)
        out.append(_FakeBatch(b, [f"u{i}_{j}" for j in range(8)]))
    return out


def _run(scanned: bool):
    model = _small_md_vae(batch_size=8)
    model.target = Target.VAE
    model.scan_epoch = scanned
    model.init_params()
    model.ensure_states(120)
    model.init_optimizers()
    model.rng = jax.random.PRNGKey(7)

    batches = _batches()
    if scanned:
        mean_loss, _ = model._fit_epoch_scanned(_FakeLoader(batches))
    else:
        losses = []
        for b in batches:
            losses.append(float(np.asarray(model.fit_batch(b))))
        mean_loss = float(np.mean(losses))
    return mean_loss, model.params, model.rng


def test_scanned_epoch_matches_per_batch_loop():
    loss_a, params_a, rng_a = _run(False)
    loss_b, params_b, rng_b = _run(True)
    assert np.allclose(loss_a, loss_b, rtol=1e-6), (loss_a, loss_b)
    # the rng split sequence is reproduced exactly
    assert jnp.array_equal(rng_a, rng_b)
    def check(path, va, vb):
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, params_a, params_b)


def test_scanned_epoch_reuses_stacked_cache():
    model = _small_md_vae(batch_size=8)
    model.target = Target.VAE
    model.scan_epoch = True
    model.init_params()
    model.ensure_states(120)
    model.init_optimizers()
    batches = _batches()
    model._fit_epoch_scanned(_FakeLoader(batches))
    n = len(model._scan_stack_cache)
    assert n == 2  # one stacked run per shape group
    model._fit_epoch_scanned(_FakeLoader(batches))
    assert len(model._scan_stack_cache) == n


def test_scanned_eval_matches_per_batch_loop():
    """Scanned VALID/TEST epochs must produce the same losses and the same
    host-side metric-stat stream as the per-batch loop."""
    def run(scanned):
        model = _small_md_vae(batch_size=8)
        model.target = Target.TEST
        model.scan_epoch = scanned
        model.init_params()
        model.ensure_states(120)
        model.init_optimizers()
        model.rng = jax.random.PRNGKey(11)
        model.on_stage_start(Stage.TEST, 1)
        batches = _batches()
        if scanned:
            avg = model._eval_epoch_scanned(_FakeLoader(batches), Stage.TEST)
        else:
            losses = []
            for b in batches:
                losses.append(model.evaluate_batch(b, Stage.TEST))
            avg = float(np.mean(losses))
        md = model.stats_loggers.get("plvl_md_stats")
        summary = md.summarize() if md is not None else None
        return avg, summary

    avg_a, sum_a = run(False)
    avg_b, sum_b = run(True)
    assert np.allclose(avg_a, avg_b, rtol=1e-5), (avg_a, avg_b)
    assert sum_a == sum_b, (sum_a, sum_b)


def test_hbm_tight_depth1_dispatch_matches_default(monkeypatch):
    """HBM-tight mode only changes how many dispatched chunks stay pinned
    (depth-1 vs depth-3 sync points) — parameters, losses, and rng must be
    bit-compatible with the default pipeline."""
    loss_a, params_a, rng_a = _run(True)
    monkeypatch.setenv("MLVAE_HBM_TIGHT", "1")
    model = _small_md_vae(batch_size=8)
    model.target = Target.VAE
    model.scan_epoch = True
    model.init_params()
    model.ensure_states(120)
    model.init_optimizers()
    model._autoscale_cache_budget()  # consumes the env override
    assert model._hbm_tight
    model.rng = jax.random.PRNGKey(7)
    loss_b, params_b = model._fit_epoch_scanned(_FakeLoader(_batches()))[0], model.params
    assert np.allclose(loss_a, loss_b, rtol=1e-6), (loss_a, loss_b)
    assert jnp.array_equal(rng_a, model.rng)
    jax.tree_util.tree_map_with_path(
        lambda path, va, vb: np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path)),
        params_a, params_b)
