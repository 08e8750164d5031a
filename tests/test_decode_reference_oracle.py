"""A/B test of the MD Viterbi decode against a LITERAL transcription of the
reference recurrence (``decode_utils.py:440-545``), written independently of
``ops/decode.py`` so the two cannot share a bug:

* init only at (l=0, t=0) with the pi term and no boundary term,
* hold uses ``log_p_b[t, 0]`` and transitions ``log_p_b[t, 1]`` — the
  reference's (inverted-looking) convention, reproduced bug-for-bug,
* weight multiplies ONLY the pi terms,
* argmax tie order (hold, from-correct, from-incorrect), final-state tie
  prefers mispronounced,
* frame labels walk back inheriting the post-transition branch.
"""
import numpy as np

from mlvae_tpu.ops import decode as dec


def _reference_decode_one(log_p_yx, log_p_y, y, log_p_b, log_p_pi, T_i, L_i,
                          weight):
    """Direct transcription of reference decode_one_utt."""
    NEG = -np.inf
    y = np.asarray(y[:L_i], np.int64)
    dp_value = np.full((L_i, T_i, 2), NEG)
    dp_path = np.full((L_i, T_i, 2), -1, np.int64)

    def emis(t, l, b):
        return log_p_yx[t, y[l], b] - log_p_y[y[l], b]

    dp_value[0, 0, 0] = weight * log_p_pi[0, 0] + emis(0, 0, 0)
    dp_value[0, 0, 1] = weight * log_p_pi[0, 1] + emis(0, 0, 1)

    for l in range(L_i):
        for t in range(1, T_i):
            if l == 0:
                for b in (0, 1):
                    dp_value[l, t, b] = (dp_value[l, t - 1, b]
                                         + log_p_b[t, 0] + emis(t, l, b))
                    dp_path[l, t, b] = 0
            else:
                for b in (0, 1):
                    hold = (dp_value[l, t - 1, b] + log_p_b[t, 0]
                            + emis(t, l, b))
                    from_c = (dp_value[l - 1, t - 1, 0] + log_p_b[t, 1]
                              + weight * log_p_pi[t, b] + emis(t, l, b))
                    from_i = (dp_value[l - 1, t - 1, 1] + log_p_b[t, 1]
                              + weight * log_p_pi[t, b] + emis(t, l, b))
                    cands = [hold, from_c, from_i]
                    dp_value[l, t, b] = np.max(cands)
                    dp_path[l, t, b] = int(np.argmax(cands))

    l, t = L_i - 1, T_i - 1
    boundary_idx, flvl, plvl = [], [], []
    if dp_value[l, t, 0] > dp_value[l, t, 1]:
        beta = 0
    else:
        beta = 1
    flvl.append(beta)
    plvl.append(beta)
    while t > 0:
        p = dp_path[l, t, beta]
        if p == 1:
            l -= 1
            boundary_idx.append(t)
            flvl.append(0)
            plvl.append(0)
            beta = 0
        elif p == 2:
            l -= 1
            boundary_idx.append(t)
            flvl.append(1)
            plvl.append(1)
            beta = 1
        else:
            flvl.append(flvl[-1])
        t -= 1
    boundary_idx.append(t)
    assert l == 0 and t == 0
    boundary = np.zeros(T_i, np.int64)
    boundary[boundary_idx] = 1
    return boundary, list(reversed(flvl)), list(reversed(plvl))


def test_oracle_matches_reference_recurrence():
    rng = np.random.default_rng(0)
    for trial in range(30):
        N = 5
        L = int(rng.integers(1, 6))
        T = int(rng.integers(L, L + 12))
        weight = float(rng.choice([0.3, 1.0, 2.5]))
        p = rng.uniform(0.02, 0.98, size=(T, N, 2))
        log_p_yx = np.log(p)
        prior = rng.uniform(0.05, 0.95, size=(N, 2))
        log_p_y = np.log(prior)
        yseq = rng.integers(0, N, size=L)
        log_p_b = np.log(rng.uniform(0.02, 0.98, size=(T, 2)))
        log_p_pi = np.log(rng.uniform(0.02, 0.98, size=(T, 2)))

        rb, rf, rp = _reference_decode_one(
            log_p_yx, log_p_y, yseq, log_p_b, log_p_pi, T, L, weight)
        ob, of, op = dec.md_viterbi_np(
            log_p_yx, log_p_y, yseq, log_p_b, log_p_pi, T, L, weight)

        np.testing.assert_array_equal(np.asarray(ob), rb,
                                      err_msg=f"boundary trial {trial}")
        np.testing.assert_array_equal(np.asarray(of), np.asarray(rf),
                                      err_msg=f"flvl trial {trial}")
        np.testing.assert_array_equal(np.asarray(op), np.asarray(rp),
                                      err_msg=f"plvl trial {trial}")
