"""Round-4 guardrails and eval-path slimming.

1. ``EVAL_PRED_KEYS``: the jitted eval step returns only the prediction keys
   the host-side metric hooks consume (the full forward tree previously
   crossed the device->host boundary per batch; over a remote-device tunnel
   that transfer dominated TEST eval wall-clock).
2. Chunked scanned epochs (``scan_chunk``): streaming dispatch must be
   bit-identical to the unchunked scan and the per-batch loop.
3. Stale-checkpoint guard: ``evaluate`` must refuse an epoch<=1 checkpoint of
   a multi-epoch config, and a selection-key fallback, unless explicitly
   allowed — a failed training run must not quietly feed TEST metrics
   (observed r3b: an OOMed w2v train's epoch-1 checkpoint fed the
   saved-phn-recog consumer with every exit code 0).
"""
import numpy as np
import pytest

import jax

from mlvae_tpu.bench_utils import build_md_vae, synth_batch
from mlvae_tpu.models.MD_VAE.model import Target
from mlvae_tpu.training.brain import Stage
from mlvae_tpu.training.checkpointer import Checkpointer

SMALL = {
    "phn_rnn_hidden_size": 64, "boundary_rnn_hidden_size": 64,
    "rnn_hidden_size": 64, "dec_rnn_hidden_size": 64,
    "phn_rnn_num_layers": 1, "boundary_rnn_num_layers": 1,
    "rnn_num_layers": 1, "dec_rnn_num_layers": 1,
}


class _FakeLoader:
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


def _model(batch_size=8):
    m = build_md_vae(batch_size=batch_size, overrides=dict(SMALL))
    m.target = Target.TEST
    m.init_params()
    m.ensure_states(120)
    m.init_optimizers()
    return m


def _batches(n=5):
    out = []
    for i, T in enumerate([32] * 3 + [48] * (n - 3)):
        b = synth_batch(batch_size=8, T=T, L=4, seed=100 + i)
        out.append(_FakeBatch(b, [f"u{i}_{j}" for j in range(8)]))
    return out


# ---------------------------------------------------------------------------
# 1) eval step returns only the declared prediction keys
# ---------------------------------------------------------------------------
def test_eval_step_returns_only_declared_keys():
    model = _model()
    model.rng = jax.random.PRNGKey(3)
    batch = _batches(1)[0]
    prepared = model.prepare_batch(batch)
    dev = model.to_device_batch(prepared)
    step = model._make_eval_step(Stage.TEST)
    preds, loss, losses = step(
        model.params, model.states, jax.random.PRNGKey(0), dev,
        jax.numpy.asarray(1, jax.numpy.int32))
    assert set(preds) == set(model.EVAL_PRED_KEYS)
    # and the declared keys are exactly what evaluate_predictions consumes
    model.on_stage_start(Stage.TEST, 1)
    model._batch_ids = list(batch["id"])
    model.evaluate_predictions(preds, prepared, Stage.TEST)
    assert model.stats_loggers["plvl_md_stats"].ids


def test_eval_pred_keys_none_returns_full_tree():
    model = _model()
    model.EVAL_PRED_KEYS = None
    batch = _batches(1)[0]
    dev = model.to_device_batch(model.prepare_batch(batch))
    step = model._make_eval_step(Stage.TEST)
    preds, _, _ = step(model.params, model.states, jax.random.PRNGKey(0),
                       dev, jax.numpy.asarray(1, jax.numpy.int32))
    assert "decoded_boundary_seq" in preds
    assert len(preds) > len(type(model).EVAL_PRED_KEYS)


# ---------------------------------------------------------------------------
# 2) chunked scanned epochs == unchunked == per-batch loop
# ---------------------------------------------------------------------------
def test_scan_chunk_matches_unchunked():
    def run(chunk):
        model = _model()
        model.target = Target.VAE
        model.scan_epoch = True
        model.scan_chunk = chunk
        model.rng = jax.random.PRNGKey(7)
        loss, _ = model._fit_epoch_scanned(_FakeLoader(_batches()))
        return loss, model.params, model.rng

    loss_a, params_a, rng_a = run(32)
    loss_b, params_b, rng_b = run(2)  # forces mid-run chunk splits
    assert np.allclose(loss_a, loss_b, rtol=1e-6)
    assert jax.numpy.array_equal(rng_a, rng_b)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        params_a, params_b)


def test_scan_chunk_eval_matches_unchunked():
    def run(chunk):
        model = _model()
        model.scan_epoch = True
        model.scan_chunk = chunk
        model.rng = jax.random.PRNGKey(11)
        model.on_stage_start(Stage.TEST, 1)
        avg = model._eval_epoch_scanned(_FakeLoader(_batches()), Stage.TEST)
        md = model.stats_loggers["plvl_md_stats"]
        return avg, md.summarize()

    avg_a, sum_a = run(32)
    avg_b, sum_b = run(2)
    assert np.allclose(avg_a, avg_b, rtol=1e-5)
    assert sum_a == sum_b


# ---------------------------------------------------------------------------
# 3) stale-checkpoint guards
# ---------------------------------------------------------------------------
def _ckpt_model(tmp_path, meta):
    model = _model()
    model.checkpointer = Checkpointer(tmp_path)
    model.checkpointer.save_checkpoint(
        {"params": model.params, "states": model.states}, meta=meta)
    return model


def test_evaluate_refuses_epoch1_ckpt_of_multiepoch_config(tmp_path):
    model = _ckpt_model(tmp_path, {"epoch": 1, "plvl_md.F1": 5.0})
    assert model.hparams["epoch_counter"].limit > 1
    with pytest.raises(RuntimeError, match="almost certainly failed"):
        model.on_evaluate_start(max_key="plvl_md.F1")


def test_allow_stale_ckpt_overrides_epoch_guard(tmp_path):
    model = _ckpt_model(tmp_path, {"epoch": 1, "plvl_md.F1": 5.0})
    model.allow_stale_ckpt = True
    model.on_evaluate_start(max_key="plvl_md.F1")  # no raise


def test_healthy_ckpt_passes_guard(tmp_path):
    model = _ckpt_model(tmp_path, {"epoch": 3, "plvl_md.F1": 5.0})
    model.on_evaluate_start(max_key="plvl_md.F1")  # no raise


def test_evaluate_refuses_selection_key_fallback(tmp_path):
    model = _ckpt_model(tmp_path, {"epoch": 3})
    with pytest.warns(UserWarning, match="falling back"):
        with pytest.raises(RuntimeError, match="selection key"):
            model.on_evaluate_start(max_key="plvl_md.F1")


def test_keyless_recipe_optout_allows_fallback(tmp_path):
    model = _ckpt_model(tmp_path, {"epoch": 3})
    model.ALLOW_KEYLESS_CKPT = True  # as HMM_DNN_ALI declares
    with pytest.warns(UserWarning, match="falling back"):
        model.on_evaluate_start(max_key="plvl_md.F1")  # warns, no raise


# ---------------------------------------------------------------------------
# 4) scanned epochs STREAM: dispatch interleaves with loader consumption
# ---------------------------------------------------------------------------
def test_fit_epoch_scanned_streams_chunks():
    """The r3b w2v OOM came from uploading the whole epoch before the first
    dispatch.  With scan_chunk=2 over 6 same-shape batches, the first scan
    dispatch must happen before the loader has yielded its last batch."""
    model = _model()
    model.target = Target.VAE
    model.scan_epoch = True
    model.scan_chunk = 2
    model.rng = jax.random.PRNGKey(5)

    events = []

    class _TracingLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            for i, b in enumerate(self.batches):
                events.append(("yield", i))
                yield b

    orig = model._get_scan_fn

    def traced_get_scan_fn(sig, K):
        events.append(("dispatch", K))
        return orig(sig, K)

    model._get_scan_fn = traced_get_scan_fn
    batches = [  # 6 same-shape batches -> 3 chunks of 2
        _FakeBatch(synth_batch(batch_size=8, T=32, L=4, seed=200 + i),
                   [f"v{i}_{j}" for j in range(8)])
        for i in range(6)
    ]
    model._fit_epoch_scanned(_TracingLoader(batches))

    first_dispatch = events.index(("dispatch", 2))
    last_yield = max(i for i, e in enumerate(events) if e[0] == "yield")
    assert first_dispatch < last_yield, events
    assert [e for e in events if e[0] == "dispatch"] == [("dispatch", 2)] * 3


# ---------------------------------------------------------------------------
# 5) EVAL_PRED_KEYS declarations cover what evaluate_predictions reads
# ---------------------------------------------------------------------------
def test_eval_pred_keys_cover_evaluate_predictions_reads():
    """Static audit over every recipe: each key accessed as
    ``predictions[...]``/``predictions.get(...)`` inside
    ``evaluate_predictions`` (or ``save_md_result``) must be present in the
    recipe's resolved EVAL_PRED_KEYS (walking the MRO, since most recipes
    inherit both the hook and the declaration)."""
    import ast
    import importlib
    from pathlib import Path

    models_dir = Path(__file__).resolve().parents[1] / "mlvae_tpu" / "models"
    recipes = sorted(p.parent.name for p in models_dir.glob("*/model.py"))
    assert len(recipes) >= 20
    for name in recipes:
        mod = importlib.import_module(f"mlvae_tpu.models.{name}.model")
        cls = mod.SBModel
        declared = cls.EVAL_PRED_KEYS
        src = (models_dir / name / "model.py").read_text()
        used = set()
        for node in ast.walk(ast.parse(src)):
            if (isinstance(node, ast.FunctionDef)
                    and node.name in ("evaluate_predictions",
                                      "save_md_result")):
                for n in ast.walk(node):
                    if (isinstance(n, ast.Subscript)
                            and isinstance(n.value, ast.Name)
                            and n.value.id == "predictions"
                            and isinstance(n.slice, ast.Constant)):
                        used.add(n.slice.value)
                    if (isinstance(n, ast.Call)
                            and isinstance(n.func, ast.Attribute)
                            and n.func.attr == "get"
                            and isinstance(n.func.value, ast.Name)
                            and n.func.value.id == "predictions"
                            and n.args
                            and isinstance(n.args[0], ast.Constant)):
                        used.add(n.args[0].value)
        if used:
            assert declared is not None, (
                f"{name}: evaluate_predictions reads {sorted(used)} but "
                f"declares no EVAL_PRED_KEYS — the eval step would fetch "
                f"the full prediction tree")
            missing = used - set(declared)
            assert not missing, (
                f"{name}: evaluate_predictions reads {sorted(missing)} "
                f"missing from EVAL_PRED_KEYS {sorted(declared)}")
