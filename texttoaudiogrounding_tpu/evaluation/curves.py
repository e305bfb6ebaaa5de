"""F-score-vs-threshold curves: collar-based and intersection-based.

Reference: run_strong.py:1118-1207 uses ``sed_scores_eval.collar_based.
fscore_curve`` + staircase AUC, and an intersection-based threshold AUC
with best-F1.  Here both curves are computed from score tracks on a
threshold grid with the same matching rules as the rest of the metric
engine (collar matching from sed_metrics; DTC/GTC intersection criteria
from th_auc).
"""

from __future__ import annotations


from typing import Dict

import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.evaluation.psds import (
    events_at_threshold as _events_at_threshold,
    staircase_auc,
)
from texttoaudiogrounding_tpu.evaluation.th_auc import (
    GroundingPrecisionRecall,
)


def collar_fscore_curve(scores: Dict[str, pd.DataFrame],
                        ground_truth: Dict[str, list],
                        onset_collar: float = 0.2,
                        offset_collar: float = 0.2,
                        offset_collar_rate: float = 0.2,
                        num_thresholds: int = 50,
                        event_class: str = "fake_event") -> dict:
    """Collar-based micro F1 over a threshold grid + its staircase AUC.

    Matching: onset within ``onset_collar``; offset within
    ``max(offset_collar, offset_collar_rate * gt_length)`` (sed_eval /
    sed_scores_eval collar semantics).
    """
    thresholds = np.linspace(0.0, 1.0, num_thresholds + 1)[1:-1]
    f_curve = []
    for th in thresholds:
        tp = fp = fn = 0
        for fname, df in scores.items():
            sys_ev = _events_at_threshold(df, event_class, th)
            ref_ev = np.array([[on, off] for on, off, _ in
                               ground_truth.get(fname, [])])
            if len(ref_ev) == 0:
                fp += len(sys_ev)
                continue
            matched = 0
            used: set = set()
            for r_on, r_off in ref_ev:
                collar = max(offset_collar,
                             offset_collar_rate * (r_off - r_on))
                for j, (s_on, s_off) in enumerate(sys_ev):
                    if j in used:
                        continue
                    if (abs(r_on - s_on) <= onset_collar
                            and abs(r_off - s_off) <= collar):
                        used.add(j)
                        matched += 1
                        break
            tp += matched
            fp += len(sys_ev) - matched
            fn += len(ref_ev) - matched
        precision = tp / max(tp + fp, 1e-15)
        recall = tp / max(tp + fn, 1e-15)
        f_curve.append(2 * precision * recall
                       / max(precision + recall, 1e-15))
    f_curve = np.asarray(f_curve)
    auc = staircase_auc(f_curve, thresholds, max_x=float(thresholds[-1]))
    return {"thresholds": thresholds, "f_curve": f_curve, "auc": auc}


def intersection_fscore_curve(scores: Dict[str, pd.DataFrame],
                              ground_truth: Dict[str, list],
                              dtc_threshold: float = 0.5,
                              gtc_threshold: float = 0.5,
                              num_thresholds: int = 50,
                              event_class: str = "fake_event") -> dict:
    """Intersection-criteria F1 over a threshold grid: staircase AUC +
    best F1 (reference evaluate_intersection_auc, run_strong.py:1166-1207).
    """
    gt_rows = [{"filename": fname, "onset": on, "offset": off}
               for fname, events in ground_truth.items()
               for on, off, _ in events]
    evaluator = GroundingPrecisionRecall(dtc_threshold, gtc_threshold,
                                         pd.DataFrame(gt_rows))
    thresholds = np.linspace(0.0, 1.0, num_thresholds + 1)[1:-1]
    for th in thresholds:
        rows = []
        for fname, df in scores.items():
            for onset, offset in _events_at_threshold(df, event_class, th):
                rows.append({"filename": fname, "onset": onset,
                             "offset": offset})
        evaluator.add_operating_point(
            pd.DataFrame(rows, columns=["filename", "onset", "offset"]),
            info={"threshold": th})
    ops = pd.DataFrame(evaluator.operating_points)
    p, r = ops.precision.values, ops.recall.values
    f_curve = 2 * p * r / np.maximum(p + r, 1e-15)
    return {
        "thresholds": thresholds,
        "f_curve": f_curve,
        "score": staircase_auc(f_curve, thresholds,
                               max_x=float(thresholds[-1])),
        "f_max": float(f_curve.max()) if len(f_curve) else 0.0,
    }
