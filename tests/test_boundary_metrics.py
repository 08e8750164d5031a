"""Direct unit tests of boundary scoring vs hand-computed values from the
reference semantics (``utils/metric_stats/boundary_metric_stats.py:30-103``):
interval-based matching (a predicted boundary is correct if it falls inside
the current target inter-boundary interval, one match per interval) and the
R-value formula."""
import numpy as np

from mlvae_tpu.metrics.boundary import BoundaryMetricStats, boundary_scoring

EPS = 1e-6


def test_interval_matching_hand_case():
    # target boundaries at 0, 4, 8 (T=10) -> intervals [0,4], [4,8], [8,10]
    target = np.zeros(10); target[[0, 4, 8]] = 1
    # predictions at 1 (in [0,4]), 5 (in [4,8]), 9 (in [8,10]) -> all correct
    pred = np.zeros(10); pred[[1, 5, 9]] = 1
    s = boundary_scoring(pred, target)
    assert abs(s["pre"] - 3 / (3 + EPS) * 100) < 1e-3
    assert abs(s["rec"] - 3 / (3 + EPS) * 100) < 1e-3

    # one interval can absorb only ONE prediction: two predictions inside
    # [0,4] -> the second is consumed without match (pre 2/3), target
    # interval [4,8] still matched by pred 5... but pointer semantics:
    # after matching 1 in [0,4], interval advances; 2 matches [4,8]? No:
    # 2 < 4 -> skipped (pi += 1); 5 in [4,8] -> correct. So correct=2.
    pred2 = np.zeros(10); pred2[[1, 2, 5]] = 1
    s2 = boundary_scoring(pred2, target)
    assert abs(s2["pre"] - 2 / (3 + EPS) * 100) < 1e-3
    assert abs(s2["rec"] - 2 / (3 + EPS) * 100) < 1e-3


def test_interval_endpoints_inclusive():
    # reference uses left <= b <= right: a boundary exactly on the next
    # target boundary index still matches the PREVIOUS interval
    target = np.zeros(6); target[[0, 3]] = 1  # intervals [0,3], [3,6]
    pred = np.zeros(6); pred[[3]] = 1  # b=3 matches interval [0,3]
    s = boundary_scoring(pred, target)
    assert abs(s["rec"] - 1 / (2 + EPS) * 100) < 1e-3
    assert abs(s["pre"] - 1 / (1 + EPS) * 100) < 1e-3


def test_r_value_perfect_is_100():
    target = np.zeros(8); target[[0, 4]] = 1
    s = boundary_scoring(target.copy(), target)
    # pre = rec = 100 (up to eps) -> os ~= 0, r1 ~= 0, r2 ~= 0
    assert abs(s["r_value"] - 100) < 0.01
    assert abs(s["f1"] - 100) < 0.01


def test_r_value_formula_hand_computed():
    target = np.zeros(10); target[[0, 4, 8]] = 1
    pred = np.zeros(10); pred[[1]] = 1  # 1 correct of 3 targets, 1 pred
    s = boundary_scoring(pred, target)
    pre = 1 / (1 + EPS) * 100
    rec = 1 / (3 + EPS) * 100
    os_ = pre / (rec + EPS) - 1
    r1 = np.sqrt((100 - rec) ** 2 + os_ ** 2)
    r2 = abs(rec - os_ - 100) / np.sqrt(2)
    assert abs(s["r_value"] - (1 - (r1 + r2) / 200) * 100) < 1e-6


def test_summarize_rounds_means():
    stats = BoundaryMetricStats()
    t = np.zeros(10); t[[0, 4, 8]] = 1
    p = np.zeros(10); p[[1, 5]] = 1
    stats.append(ids=["a"], predictions=[p], targets=[t])
    means = stats.summarize()
    assert means["rec"] == round(2 / (3 + EPS) * 100, 2)
    assert set(means) == {"pre", "rec", "f1", "r_value"}
