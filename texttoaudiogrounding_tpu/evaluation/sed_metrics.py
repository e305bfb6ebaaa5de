"""Event-based and segment-based SED metrics (sed_eval semantics).

Self-contained replacement for the ``sed_eval`` dependency used by the
reference (utils/eval_util.py:354-425): event-based F1 with onset collar +
offset collar ``max(t_collar, percentage_of_length * gt_length)``, and
segment-based F1 on a fixed time grid.  Micro (instance-pooled) and macro
(class-averaged) scores are returned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _f_measure(tp: float, fp: float, fn: float) -> dict:
    precision = tp / max(tp + fp, 1e-15)
    recall = tp / max(tp + fn, 1e-15)
    f = 2 * precision * recall / max(precision + recall, 1e-15)
    return {"f_measure": f, "precision": precision, "recall": recall}


def _match_events(ref: np.ndarray, sys: np.ndarray, t_collar: float,
                  percentage_of_length: float) -> int:
    """Greedy unique matching of [R, 2] ref vs [S, 2] sys events
    (sed_eval ``EventBasedMetrics`` matching rule)."""
    matched_sys: set[int] = set()
    num_tp = 0
    for r_on, r_off in ref:
        offset_collar = max(t_collar, percentage_of_length * (r_off - r_on))
        for j, (s_on, s_off) in enumerate(sys):
            if j in matched_sys:
                continue
            if (abs(r_on - s_on) <= t_collar
                    and abs(r_off - s_off) <= offset_collar):
                matched_sys.add(j)
                num_tp += 1
                break
    return num_tp


def event_based_metrics(reference: pd.DataFrame, estimated: pd.DataFrame,
                        t_collar: float = 0.2,
                        percentage_of_length: float = 0.2) -> dict:
    """Event-based metrics over (filename, onset, offset, event_label)
    tables (reference utils/eval_util.py:354-391)."""
    classes = sorted(set(reference.event_label.dropna())
                     | set(estimated.event_label.dropna()))
    per_class = {}
    tot_tp = tot_fp = tot_fn = 0
    for cls in classes:
        tp = fp = fn = 0
        ref_c = reference[reference.event_label == cls]
        sys_c = estimated[estimated.event_label == cls]
        files = set(ref_c.filename) | set(sys_c.filename)
        for fname in files:
            ref_ev = ref_c[ref_c.filename == fname][
                ["onset", "offset"]].values
            sys_ev = sys_c[sys_c.filename == fname][
                ["onset", "offset"]].values
            ntp = _match_events(ref_ev, sys_ev, t_collar,
                                percentage_of_length)
            tp += ntp
            fp += len(sys_ev) - ntp
            fn += len(ref_ev) - ntp
        per_class[cls] = _f_measure(tp, fp, fn)
        tot_tp += tp
        tot_fp += fp
        tot_fn += fn
    macro = float(np.mean([v["f_measure"] for v in per_class.values()])
                  ) if per_class else 0.0
    return {"overall": _f_measure(tot_tp, tot_fp, tot_fn),
            "class_wise_average": {"f_measure": macro},
            "class_wise": per_class}


def segment_based_metrics(reference: pd.DataFrame, estimated: pd.DataFrame,
                          time_resolution: float = 1.0) -> dict:
    """Segment-based metrics on a fixed grid (reference
    utils/eval_util.py:394-415)."""
    classes = sorted(set(reference.event_label.dropna())
                     | set(estimated.event_label.dropna()))
    files = sorted(set(reference.filename) | set(estimated.filename))
    per_class_counts = {c: [0, 0, 0] for c in classes}  # tp, fp, fn
    for fname in files:
        ref_f = reference[reference.filename == fname]
        sys_f = estimated[estimated.filename == fname]
        max_t = max(
            float(ref_f.offset.max()) if len(ref_f) else 0.0,
            float(sys_f.offset.max()) if len(sys_f) else 0.0)
        num_seg = int(np.ceil(max_t / time_resolution)) if max_t > 0 else 0
        if num_seg == 0:
            continue
        grid = np.arange(num_seg) * time_resolution
        for cls in classes:
            ref_act = np.zeros(num_seg, bool)
            sys_act = np.zeros(num_seg, bool)
            for df, act in ((ref_f[ref_f.event_label == cls], ref_act),
                            (sys_f[sys_f.event_label == cls], sys_act)):
                for _, row in df.iterrows():
                    act |= (grid + time_resolution > row.onset) & \
                           (grid < row.offset)
            tp = int((ref_act & sys_act).sum())
            fp = int((~ref_act & sys_act).sum())
            fn = int((ref_act & ~sys_act).sum())
            counts = per_class_counts[cls]
            counts[0] += tp
            counts[1] += fp
            counts[2] += fn
    per_class = {c: _f_measure(*v) for c, v in per_class_counts.items()}
    tot = np.sum(list(per_class_counts.values()), axis=0) \
        if per_class_counts else np.zeros(3)
    macro = float(np.mean([v["f_measure"] for v in per_class.values()])
                  ) if per_class else 0.0
    return {"overall": _f_measure(*tot),
            "class_wise_average": {"f_measure": macro},
            "class_wise": per_class}


def compute_sed_eval(valid_df: pd.DataFrame, pred_df: pd.DataFrame,
                     t_collar: float = 0.2,
                     time_resolution: float = 1.0) -> tuple[dict, dict]:
    """Reference ``compute_sed_eval`` (utils/eval_util.py:418-425)."""
    event = event_based_metrics(valid_df, pred_df, t_collar=t_collar,
                                percentage_of_length=0.2)
    segment = segment_based_metrics(valid_df, pred_df,
                                    time_resolution=time_resolution)
    return event, segment
