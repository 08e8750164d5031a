"""Direct unit tests of the MD scoring math (previously only exercised
through recipe runs) against hand-computed values from the reference
semantics (``utils/metric_stats/md_metric_stats.py``):

* the INVERTED counting convention (TP = matching zeros, detection
  PRE/REC over the ones, ``md_metric_stats.py:111-120``),
* summarize-time F1 recomputed from MEAN PRE/REC — but NOT soft_F1
  (``:31-45``),
* IOU-weighted soft scores with the reference's final-segment quirk
  (last end = phoneme count, ``data_utils.py:159-181``),
* per-class PER split (``:230-294``).
"""
import numpy as np

from mlvae_tpu.metrics.md import (MDMetricStats, binary_seq_md_scoring,
                                  boundary_md_scoring,
                                  boundary_seq_to_segments, per_scoring,
                                  segment_iou)

EPS = 1e-6


def test_binary_md_scoring_inverted_convention():
    # pred:   1 0 1 0  (1 = mispronounced)
    # target: 1 1 0 0
    pred = [1, 0, 1, 0]
    target = [1, 1, 0, 0]
    s = binary_seq_md_scoring(pred, target)
    # TP = matching zeros = 1 (pos 3); TN = matching ones = 1 (pos 0)
    # FP = pred 0 / target 1 = 1 (pos 1); FN = pred 1 / target 0 = 1 (pos 2)
    assert abs(s["ACC"] - 2 / (4 + EPS) * 100) < 1e-3
    # PRE = TN/(TN+FN) over the ONES (detections)
    assert abs(s["PRE"] - 1 / (2 + EPS) * 100) < 1e-3
    assert abs(s["REC"] - 1 / (2 + EPS) * 100) < 1e-3
    f1 = 2 * s["PRE"] * s["REC"] / (s["PRE"] + s["REC"] + EPS)
    assert abs(s["F1"] - f1) < 1e-6


def test_boundary_segments_reference_final_end_quirk():
    # boundaries at frames 0, 3, 5 of an 8-frame utterance (3 phonemes)
    b = [1, 0, 0, 1, 0, 1, 0, 0]
    seg = boundary_seq_to_segments(b)
    # reference data_utils.py:178: last end is len(boundary_index_seq) == 3,
    # NOT the utterance length 8
    np.testing.assert_array_equal(seg, [[0, 3], [3, 5], [5, 3]])


def test_segment_iou_hand_computed():
    pred = [[0, 3], [3, 5]]
    gt = [[0, 2], [2, 5]]
    iou = segment_iou(pred, gt)
    np.testing.assert_allclose(iou, [2 / (3 + 1e-5), 2 / (3 + 1e-5)],
                               rtol=1e-6)


def test_boundary_md_scoring_soft_scores():
    # two phonemes; pred boundary at 0,2 vs gt at 0,3 over 6 frames
    pred_b = [1, 0, 1, 0, 0, 0]
    gt_b = [1, 0, 0, 1, 0, 0]
    pred_md = [1, 0]
    gt_md = [1, 1]
    s = boundary_md_scoring(pred_b, gt_b, pred_md, gt_md)
    # segments: pred [[0,2],[2,2]], gt [[0,3],[3,2]]  (final-end quirk: L=2)
    iou0 = 2 / (3 + 1e-5)
    # pred [2,2] vs gt [3,2]: inter = max(0, min(2,2)-max(2,3)) = 0;
    # union = max(2,2)-min(2,3) = 0
    iou1 = 0.0
    assert abs(s["ave_iou"] - (iou0 + iou1) / 2 * 100) < 1e-3
    # soft counts: TN (matching ones) only at phoneme 0 -> soft_TN = iou0
    # TP = 0, FP (pred 0/target 1) at phoneme 1, FN = 0
    assert abs(s["soft_PRE"] - iou0 / (1 + EPS) * 100) < 1e-3
    assert abs(s["soft_REC"] - iou0 / (2 + EPS) * 100) < 1e-3
    # misp_iou over gt==1 (both); correct_iou has no members -> 0
    assert abs(s["misp_iou"] - (iou0 + iou1) / 2 * 100) < 1e-3
    assert s["correct_iou"] == 0.0


def test_per_scoring_split():
    pred = [1, 2, 3, 4]
    gt = [1, 2, 9, 8]
    cnncl = [1, 2, 3, 8]  # phonemes 0,1,3... gt==cnncl at 0,1; misp at 2,3?
    # gt == cnncl: positions 0, 1 (correct); positions 2, 3 mispronounced
    # wait: gt[3]=8 == cnncl[3]=8 -> correct. So correct = {0,1,3}, misp={2}
    s = per_scoring(pred, gt, cnncl)
    # correct positions {0,1,3}: pred vs gt mismatch only at 3 (4 != 8)
    assert abs(s["correct_per"] - 1 / (3 + 1e-5) * 100) < 1e-3
    # misp positions {2}: pred 3 != gt 9 -> 1/1
    assert abs(s["misp_per"] - 1 / (1 + 1e-5) * 100) < 1e-3


def test_summarize_recomputes_hard_f1_only():
    stats = MDMetricStats()
    stats.append(
        ids=["a", "b", "c"],
        pred_md_lbl_seqs=[[1, 0], [0, 0], [1, 1]],
        gt_md_lbl_seqs=[[1, 1], [0, 1], [1, 0]],
        pred_boundary_seqs=[[1, 1], [1, 1], [1, 1]],
        gt_boundary_seqs=[[1, 1], [1, 1], [1, 1]],
    )
    means = stats.summarize()
    per_utt = stats.scores_list
    mean_pre = np.mean([s["PRE"] for s in per_utt])
    mean_rec = np.mean([s["REC"] for s in per_utt])
    expect_f1 = 2 * mean_pre * mean_rec / (mean_pre + mean_rec + EPS)
    assert means["F1"] == round(float(expect_f1), 2)
    # F1 recomputed from means differs from the mean of per-utt F1s here
    assert abs(expect_f1 - np.mean([s["F1"] for s in per_utt])) > 1
    # soft_F1 is NOT recomputed: it stays the mean of per-utterance soft_F1
    expect_soft = round(float(np.mean([s["soft_F1"] for s in per_utt])), 2)
    assert means["soft_F1"] == expect_soft
