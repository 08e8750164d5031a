"""Pallas MD-Viterbi kernels vs the scan decoder and the numpy oracle.

The kernels (interpret mode here) must reproduce ``md_viterbi_batch``
BIT-EXACTLY on every output — boundaries, frame labels, phoneme labels —
including argmax tie-breaking, validity masking of ragged lengths, and the
weight parameter; the scan path itself is locked against the reference
recurrence by ``test_decode.py`` / ``test_decode_reference_oracle.py``.
"""
import numpy as np

import jax.numpy as jnp

from mlvae_tpu.ops import decode as dec
from mlvae_tpu.ops.decode_pallas import md_viterbi_batch_pallas

from test_decode import _random_problem


def _both(prob, weight=1.0):
    args = [jnp.asarray(a) for a in prob[:5]]
    t_lens, l_lens = jnp.asarray(prob[5]), jnp.asarray(prob[6])
    ref = dec.md_viterbi_batch(*args, t_lens, l_lens, weight)
    got = md_viterbi_batch_pallas(*args, t_lens, l_lens, weight,
                                  interpret=True)
    return [np.asarray(a) for a in ref], [np.asarray(a) for a in got]


def test_pallas_decode_matches_scan_decoder():
    rs = np.random.RandomState(0)
    for trial in range(5):
        ref, got = _both(_random_problem(rs))
        for name, a, b in zip(("boundary", "flvl", "plvl"), ref, got):
            np.testing.assert_array_equal(b, a,
                                          err_msg=f"trial {trial} {name}")


def test_pallas_decode_weight_and_ties():
    rs = np.random.RandomState(7)
    # near-tied lattices (quantized probabilities) stress first-max
    # tie-breaking; weight != 1 stresses the switch-score composition
    for weight in (0.0, 0.5, 2.0):
        prob = list(_random_problem(rs, B=4, T=24, N=5, Lmax=5))
        prob[0] = np.round(prob[0], 1)
        prob[3] = np.round(prob[3], 1)
        prob[4] = np.round(prob[4], 1)
        ref, got = _both(tuple(prob), weight)
        for name, a, b in zip(("boundary", "flvl", "plvl"), ref, got):
            np.testing.assert_array_equal(b, a, err_msg=f"w={weight} {name}")


def test_pallas_decode_vs_numpy_oracle():
    rs = np.random.RandomState(3)
    prob = _random_problem(rs, B=4, T=30, N=6, Lmax=6)
    log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens = prob
    boundary, flvl, plvl = (np.asarray(a) for a in md_viterbi_batch_pallas(
        *(jnp.asarray(a) for a in prob[:5]),
        jnp.asarray(t_lens), jnp.asarray(l_lens), 1.0, interpret=True))
    for i in range(len(t_lens)):
        T_i, L_i = int(t_lens[i]), int(l_lens[i])
        b_np, f_np, p_np = dec.md_viterbi_np(
            log_p_yx[i], log_p_y, y[i], log_p_b[i], log_p_pi[i], T_i, L_i)
        np.testing.assert_array_equal(boundary[i, :T_i], b_np)
        np.testing.assert_array_equal(flvl[i, :T_i], f_np)
        np.testing.assert_array_equal(plvl[i, :L_i], p_np)


def test_pallas_decode_jittable_with_traced_weight():
    """The production dispatch path reaches the kernel from inside the
    jitted ``md_viterbi_batch``, where ``weight`` is a tracer — the kernel
    wrapper must not require it to be concrete (regression: a
    ``float(weight)`` kernel constant raised ConcretizationTypeError)."""
    import functools
    import jax

    rs = np.random.RandomState(5)
    prob = _random_problem(rs, B=4, T=16, N=5, Lmax=4)
    args = [jnp.asarray(a) for a in prob[:5]]
    t_lens, l_lens = jnp.asarray(prob[5]), jnp.asarray(prob[6])
    jit_pallas = jax.jit(
        functools.partial(md_viterbi_batch_pallas, interpret=True))
    got = jit_pallas(*args, t_lens, l_lens, jnp.float32(0.7))  # traced w
    ref = dec.md_viterbi_batch(*args, t_lens, l_lens, 0.7)
    for name, a, b in zip(("boundary", "flvl", "plvl"), ref, got):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=name)


def test_pallas_decode_batch_blocking():
    """B > 128 exercises multi-batch-block grids (per-block carries and
    per-block constant-indexed output slots)."""
    import mlvae_tpu.ops.decode_pallas as dp

    rs = np.random.RandomState(11)
    prob = _random_problem(rs, B=12, T=20, N=5, Lmax=4)
    old = dp._bb
    try:
        dp._bb = lambda B: 4  # force 3 batch blocks
        ref, got = _both(prob)
    finally:
        dp._bb = old
    for name, a, b in zip(("boundary", "flvl", "plvl"), ref, got):
        np.testing.assert_array_equal(b, a, err_msg=name)
