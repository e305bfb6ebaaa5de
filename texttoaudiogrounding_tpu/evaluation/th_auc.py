"""Grounding threshold-AUC: F-score-vs-threshold area, the reference's
custom headline metric.

Reference: utils/eval_util.py:295-332 and the ``Grounding_PrecisionRecall``
evaluator :431-663 — TP criteria under DTC/GTC intersection matching for the
single-class grounding case; the F1(threshold) curve is integrated with the
trapezoid rule over a threshold range and normalized by the range width.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.evaluation.psds import _intersections


class GroundingPrecisionRecall:
    """Accumulates (precision, recall) per operating point.

    Reference: utils/eval_util.py:431-652.
    """

    detection_cols = ("filename", "onset", "offset")

    def __init__(self, dtc_threshold: float, gtc_threshold: float,
                 ground_truth: pd.DataFrame):
        if not 0.0 <= dtc_threshold <= 1.0:
            raise ValueError("dtc_threshold must be between 0 and 1")
        if not 0.0 <= gtc_threshold <= 1.0:
            raise ValueError("gtc_threshold must be between 0 and 1")
        self.dtc_threshold = dtc_threshold
        self.gtc_threshold = gtc_threshold
        self.eps = 1e-15
        gt = ground_truth.copy().dropna(
            subset=["filename", "onset", "offset"])
        gt = gt.sort_values(by=["filename", "onset"])
        gt = gt.rename(columns={"onset": "onset_gt", "offset": "offset_gt"})
        gt["duration_gt"] = gt.offset_gt - gt.onset_gt
        gt["id_gt"] = np.arange(len(gt))
        self.ground_truth = gt
        self.operating_points: list[dict] = []

    def _evaluate_detections(self, det: pd.DataFrame):
        det = det.copy().sort_values(by=["filename", "onset"])
        det = det.rename(columns={"onset": "onset_det",
                                  "offset": "offset_det"})
        det["duration_det"] = det.offset_det - det.onset_det
        det["id_det"] = np.arange(len(det))
        cross = _intersections(
            det[["filename", "onset_det", "offset_det", "duration_det",
                 "id_det"]],
            self.ground_truth[["filename", "onset_gt", "offset_gt",
                               "duration_gt", "id_gt"]])
        num_refs = len(self.ground_truth)
        num_preds = len(det)

        if cross.empty:
            return 0.0, 0.0

        # recall criterion (reference :559-591): dets that satisfy DTC,
        # then gts covered >= gtc by those dets
        prec_sum = cross.groupby("id_det").det_precision.sum()
        dtc_ids = prec_sum[prec_sum >= self.dtc_threshold].index
        cov_sum = cross[cross.id_det.isin(dtc_ids)].groupby(
            "id_gt").gt_coverage.sum()
        num_tp_refs = int((cov_sum >= self.gtc_threshold).sum())

        # precision criterion (reference :594-626): gts covered >= gtc by
        # all dets, then dets whose precision over those gts >= dtc
        cov_all = cross.groupby("id_gt").gt_coverage.sum()
        gtc_ids = cov_all[cov_all >= self.gtc_threshold].index
        prec_valid = cross[cross.id_gt.isin(gtc_ids)].groupby(
            "id_det").det_precision.sum()
        num_tp_preds = int((prec_valid >= self.dtc_threshold).sum())

        recall = num_tp_refs / max(num_refs, self.eps)
        precision = num_tp_preds / max(num_preds, self.eps)
        return precision, recall

    def add_operating_point(self, detections: pd.DataFrame,
                            info: Optional[dict] = None) -> None:
        info = dict(info or {})
        if len(detections) == 0:
            precision, recall = 0.0, 0.0
        else:
            precision, recall = self._evaluate_detections(detections)
        self.operating_points.append(
            {"precision": precision, "recall": recall, **info})

    def th_auc(self, beta: float = 1.0, low_th: float = 0.0,
               high_th: float = 1.0) -> float:
        """F-beta-vs-threshold trapezoid AUC / (high_th - low_th).

        Reference: utils/eval_util.py:640-652 (sklearn.metrics.auc is the
        trapezoid rule).
        """
        ops = pd.DataFrame(self.operating_points)
        p, r = ops.precision.values, ops.recall.values
        ops["f_score"] = ((1 + beta**2) * p * r
                          / np.maximum(beta**2 * p + r, self.eps))
        sub = ops[(ops.threshold >= low_th) & (ops.threshold <= high_th)]
        order = np.argsort(sub.threshold.values)
        x = sub.threshold.values[order]
        y = sub.f_score.values[order]
        score = float(np.trapezoid(y, x))
        return score / (high_th - low_th)

    def best_fscore(self, beta: float = 1.0):
        ops = pd.DataFrame(self.operating_points)
        p, r = ops.precision.values, ops.recall.values
        f = ((1 + beta**2) * p * r / np.maximum(beta**2 * p + r, self.eps))
        i = int(np.argmax(f))
        return {"f_score": float(f[i]),
                "threshold": float(ops.threshold.values[i]),
                "precision": float(p[i]), "recall": float(r[i])}


def compute_th_auc(prediction_dfs: Dict[float, pd.DataFrame],
                   ground_truth, dtc_threshold: float = 0.5,
                   gtc_threshold: float = 0.5,
                   min_threshold: float = 0.0, max_threshold: float = 1.0,
                   beta: float = 1.0, save_dir=None) -> float:
    """Driver mirroring reference ``compute_th_auc``
    (utils/eval_util.py:295-332)."""
    if not isinstance(ground_truth, pd.DataFrame):
        ground_truth = pd.read_csv(ground_truth, sep="\t")
    evaluator = GroundingPrecisionRecall(dtc_threshold, gtc_threshold,
                                         ground_truth)
    for i, k in enumerate(sorted(prediction_dfs.keys())):
        evaluator.add_operating_point(
            prediction_dfs[k], info={"name": f"Op {i+1:02d}",
                                     "threshold": k})
    value = evaluator.th_auc(beta=beta, low_th=min_threshold,
                             high_th=max_threshold)
    if save_dir is not None:
        from pathlib import Path

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        ops = pd.DataFrame(evaluator.operating_points)
        pd.DataFrame(ops).to_csv(
            save_dir / f"op_table_dtc{dtc_threshold}_gtc{gtc_threshold}.csv",
            sep="\t", index=False, float_format="%.3f")
        order = np.argsort(ops.threshold.values)
        p, r = ops.precision.values, ops.recall.values
        f = (1 + beta**2) * p * r / np.maximum(beta**2 * p + r, 1e-15)
        plt.figure(figsize=(14, 5))
        plt.plot(ops.threshold.values[order], f[order])
        plt.ylim(0.0, 1.0)
        plt.xlabel("threshold")
        plt.ylabel("f_score")
        plt.savefig(save_dir / "f_vs_th.png", dpi=150, bbox_inches="tight")
        plt.close()
    return value
