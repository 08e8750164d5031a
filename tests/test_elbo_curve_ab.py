"""Trajectory-level ELBO parity gate (BASELINE.md: "ELBO curves matching
within tolerance").

Runs ``tools/elbo_curve_ab.py`` for a short seeded training trajectory:
the reference's OWN torch modules (``/root/reference/src/modules/*`` +
the ``md_model.py:189-213`` loss math) vs our production fused train step
(``Brain._make_train_step`` driving the real ``models.MD_VAE.SBModel``),
identical init params and batches, symmetric determinization.  The
committed 60-step artifact lives at ``docs/elbo_curve_ab.json``; this test
keeps the harness itself from rotting.
"""
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
if str(TOOLS) not in sys.path:
    sys.path.insert(0, str(TOOLS))

REFERENCE = Path("/root/reference/src")


@pytest.mark.skipif(not REFERENCE.exists(),
                    reason="reference checkout not available")
def test_trajectory_matches_reference():
    import jax
    from elbo_curve_ab import run_ab

    prec_before = jax.config.jax_default_matmul_precision
    try:
        report = run_ab(steps=6, flvl_every=3)
    finally:
        jax.config.update("jax_default_matmul_precision", prec_before)

    # per-step total loss tracks the reference's trajectory
    assert report["max_rel"]["total"] < 1e-3, report["max_rel"]
    # every per-key loss curve too (KLD terms are ~1e1 smaller in
    # magnitude, so allow a little more relative room)
    for key, rel in report["max_rel"].items():
        assert rel < 5e-3, (key, rel)
    # the self-training decode labels are bit-identical
    assert report["decoded_flvl_labels_identical"], "no checkpoints taken"
    assert all(report["decoded_flvl_labels_identical"].values()), \
        report["decoded_flvl_labels_identical"]
