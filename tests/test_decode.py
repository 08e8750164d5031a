"""Decode layer tests: device DP vs exact numpy oracle, invariants, wrapper."""
import numpy as np

import jax
import jax.numpy as jnp

from mlvae_tpu.ops import decode as dec


def _random_problem(rs, B=3, T=40, N=7, Lmax=6):
    t_lens = rs.randint(T // 2, T + 1, B)
    l_lens = rs.randint(2, Lmax + 1, B)
    t_lens[0], l_lens[0] = T, Lmax  # one full-size sample
    p = rs.rand(B, T, N) * 0.98 + 0.01
    log_p_yx = dec.clamped_log_np(np.stack([p, 1 - p], axis=3))
    prior = rs.dirichlet(np.ones(N))
    log_p_y = dec.clamped_log_np(np.stack([prior, 1 - prior], axis=1))
    y = rs.randint(0, N, (B, Lmax))
    bv = rs.rand(B, T) * 0.98 + 0.01
    log_p_b = dec.clamped_log_np(np.stack([bv, 1 - bv], axis=2))
    logits = rs.randn(B, T, 2)
    log_p_pi = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens


def test_device_decoder_matches_numpy_oracle():
    rs = np.random.RandomState(0)
    for trial in range(5):
        prob = _random_problem(rs)
        log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens = prob
        boundary, flvl, plvl = dec.md_viterbi_batch(
            *(jnp.asarray(a) for a in (log_p_yx, log_p_y, y, log_p_b, log_p_pi)),
            jnp.asarray(t_lens), jnp.asarray(l_lens), 1.0,
        )
        boundary, flvl, plvl = map(np.asarray, (boundary, flvl, plvl))
        for i in range(len(t_lens)):
            T_i, L_i = int(t_lens[i]), int(l_lens[i])
            b_np, f_np, p_np = dec.md_viterbi_np(
                log_p_yx[i], log_p_y, y[i], log_p_b[i], log_p_pi[i], T_i, L_i
            )
            np.testing.assert_array_equal(boundary[i, :T_i], b_np,
                                          err_msg=f"trial {trial} utt {i} boundary")
            np.testing.assert_array_equal(flvl[i, :T_i], f_np,
                                          err_msg=f"trial {trial} utt {i} flvl")
            np.testing.assert_array_equal(plvl[i, :L_i], p_np,
                                          err_msg=f"trial {trial} utt {i} plvl")


def test_decoder_invariants():
    rs = np.random.RandomState(7)
    prob = _random_problem(rs, B=4, T=60, N=9, Lmax=8)
    log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens = prob
    boundary, flvl, plvl = map(np.asarray, dec.md_viterbi_batch(
        *(jnp.asarray(a) for a in (log_p_yx, log_p_y, y, log_p_b, log_p_pi)),
        jnp.asarray(t_lens), jnp.asarray(l_lens), 1.0,
    ))
    for i in range(4):
        T_i, L_i = int(t_lens[i]), int(l_lens[i])
        # exactly one boundary per phoneme, first frame is a boundary
        assert boundary[i, :T_i].sum() == L_i
        assert boundary[i, 0] == 1
        # frame labels constant within segments
        idx = np.where(boundary[i, :T_i] == 1)[0].tolist() + [T_i]
        for k in range(L_i):
            seg = flvl[i, idx[k]:idx[k + 1]]
            assert (seg == seg[0]).all()
            assert seg[0] == plvl[i, k]


def test_weight_parameter():
    rs = np.random.RandomState(3)
    prob = _random_problem(rs, B=2, T=30, N=5, Lmax=4)
    log_p_yx, log_p_y, y, log_p_b, log_p_pi, t_lens, l_lens = prob
    for w in [0.5, 2.0]:
        boundary, flvl, plvl = map(np.asarray, dec.md_viterbi_batch(
            *(jnp.asarray(a) for a in (log_p_yx, log_p_y, y, log_p_b, log_p_pi)),
            jnp.asarray(t_lens), jnp.asarray(l_lens), w,
        ))
        for i in range(2):
            T_i, L_i = int(t_lens[i]), int(l_lens[i])
            b_np, f_np, p_np = dec.md_viterbi_np(
                log_p_yx[i], log_p_y, y[i], log_p_b[i], log_p_pi[i],
                T_i, L_i, weight=w,
            )
            np.testing.assert_array_equal(boundary[i, :T_i], b_np)
            np.testing.assert_array_equal(plvl[i, :L_i], p_np)


def test_reference_compatible_wrapper():
    rs = np.random.RandomState(5)
    B, T, N, L = 2, 24, 6, 4
    predictions = {
        "phn_recog_out": rs.randn(B, T, N).astype(np.float32),
        "boundary_v": (rs.rand(B, T) * 0.9 + 0.05).astype(np.float32),
        "pi_logits": rs.randn(B, T, 2).astype(np.float32),
    }
    feat_lens = np.asarray([1.0, 0.75])
    plvl = rs.randint(0, N, (B, L))
    plvl_lens = np.asarray([1.0, 0.5])
    prior = rs.dirichlet(np.ones(N)).astype(np.float32)
    bs, fs, ps = dec.decode_plvl_md_lbl_seqs_full(
        predictions, ["a", "b"], feat_lens, plvl, plvl_lens, prior
    )
    assert len(bs) == len(fs) == len(ps) == B
    assert len(bs[0]) == T and len(bs[1]) == 18
    assert len(ps[0]) == L and len(ps[1]) == 2
    assert len(fs[0]) == T and len(fs[1]) == 18
    assert bs[0].sum() == L and bs[1].sum() == 2


def test_legacy_two_pass_decoders():
    rs = np.random.RandomState(9)
    B, T, N, L = 2, 20, 5, 3
    eval_outputs = {
        "phoneme_ret": rs.randn(B, T, N).astype(np.float32),
        "boundary_beta": (rs.rand(B, T) * 0.9 + 0.05).astype(np.float32),
    }
    can_seqs = np.eye(N)[rs.randint(0, N, (B, L))]
    lens = [T, 15]
    can_lens = [L, 2]
    prior = rs.dirichlet(np.ones(N))
    bounds = dec.decode_boundary(eval_outputs, ["a", "b"], lens, can_seqs,
                                 can_lens, prior)
    assert bounds["a"].sum() == L and bounds["b"].sum() == 2
    eval_outputs["decoded_boundaries"] = bounds
    md = dec.decode_phoneme_mdd_conditional(
        eval_outputs, ["a", "b"], lens, can_seqs, can_lens, prior
    )
    assert md.shape == (B, L)
    assert set(np.unique(md)) <= {0, 1}
