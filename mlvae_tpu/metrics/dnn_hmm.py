"""External DNN-HMM / forced-alignment scoring (parity with reference
``utils/externel_metrics/dnn_hmm_metrics.py``): boundary metrics, MD metrics
against an all-correct baseline (FA) or the external system's labels, and
IOU-weighted boundary-MD metrics, averaged over the set."""
from __future__ import annotations

from typing import Dict

import numpy as np

from mlvae_tpu.metrics.boundary import boundary_scoring
from mlvae_tpu.metrics.md import binary_seq_md_scoring, boundary_md_scoring


def _accumulate(metrics: Dict, sample_metrics: Dict):
    for key, value in sample_metrics.items():
        metrics.setdefault(key, []).append(float(value))


def compute_fa_metrics(dataset) -> Dict[str, float]:
    metrics: Dict = {}
    for sample in dataset:
        out = {}
        fa_b = np.asarray(sample["fa_boundary_seq"])
        gt_b = np.asarray(sample["gt_boundary_seq"])
        for k, v in boundary_scoring(fa_b, gt_b).items():
            out["boundary." + k] = v
        gt_md = np.asarray(sample["plvl_gt_md_lbl_seq"])
        pred_md = np.zeros_like(gt_md)
        for k, v in binary_seq_md_scoring(pred_md, gt_md).items():
            out["MD." + k] = v
        for k, v in boundary_md_scoring(fa_b, gt_b, pred_md, gt_md).items():
            out["boundary_MD." + k] = v
        _accumulate(metrics, out)
    return {k: float(np.mean(v)) for k, v in metrics.items()}


def compute_asr_metrics(dataset) -> Dict[str, float]:
    metrics: Dict = {}
    for sample in dataset:
        out = {}
        hmm_b = np.asarray(sample["ext_dnn_hmm_boundary_seq"])
        gt_b = np.asarray(sample["gt_boundary_seq"])
        for k, v in boundary_scoring(hmm_b, gt_b).items():
            out["boundary." + k] = v
        gt_md = np.asarray(sample["plvl_gt_md_lbl_seq"])
        pred_md = np.asarray(sample["ext_plvl_dnn_hmm_md_lbl_seq"])
        for k, v in binary_seq_md_scoring(pred_md, gt_md).items():
            out["MD." + k] = v
        for k, v in boundary_md_scoring(hmm_b, gt_b, pred_md, gt_md).items():
            out["boundary_MD." + k] = v
        _accumulate(metrics, out)
    return {k: float(np.mean(v)) for k, v in metrics.items()}


def compute_dnn_hmm_metrics(dataset):
    fa = compute_fa_metrics(dataset)
    for key, value in fa.items():
        print(f"fa.{key}: {round(value, 2)}")
    asr = compute_asr_metrics(dataset)
    for key, value in asr.items():
        print(f"asr.{key}: {round(value, 2)}")
    return {"fa": fa, "asr": asr}
