"""PSDS (Polyphonic Sound Detection Score) — self-contained implementation.

The environment ships neither ``psds_eval`` nor ``sed_scores_eval``, so this
module implements the metric from its definition, covering both reference
code paths:

* operating-point PSDS (psds_eval semantics — reference
  utils/eval_util.py:136-223): DTC/GTC/CTTC intersection criteria per
  operating point, per-class staircase ROC of best operating points,
  effective TPR ``mu - alpha_st * sigma``, staircase AUC normalized by
  ``max_efpr``;
* threshold-resolved PSDS over score curves (sed_scores_eval semantics —
  reference utils/eval_util.py:226-292), here evaluated on a dense
  threshold grid over the same criteria (``max_efpr=None`` supported).

Grounding uses a single class (``fake_event``), dtc=gtc=0.5,
``alpha_ct=alpha_st=0`` (reference eval configs).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd

WORLD = "WORLD"


def staircase_auc(y: np.ndarray, x: np.ndarray,
                  max_x: Optional[float] = None, *,
                  monotonize: bool = False) -> float:
    """Area under a right-continuous step function given sample points.

    Matches ``sed_scores_eval.utils.auc.staircase_auc``: sort by x,
    integrate y as a step function (value holds until the next x), up
    to ``max_x`` — WITHOUT re-monotonizing y (sed_scores_eval never
    cummaxes the curve it integrates; a dipping effective-TPR or
    F-vs-threshold curve must integrate its dips).  ``monotonize=True``
    additionally takes the running max of y — the per-class PSD-ROC
    envelope semantics (best achievable TPR at each eFPR), used only
    where this function doubles as the single-class ROC constructor.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    order = np.argsort(x, kind="stable")
    x, y = x[order], y[order]
    if monotonize:
        y = np.maximum.accumulate(y)
    if max_x is None:
        max_x = x[-1] if len(x) else 0.0
    keep = x <= max_x
    x, y = x[keep], y[keep]
    if len(x) == 0:
        return 0.0
    widths = np.diff(np.r_[x, max_x])
    return float(np.sum(y * widths))


def events_at_threshold(df: pd.DataFrame, column: str,
                        threshold: float) -> np.ndarray:
    """Score DataFrame (onset/offset/<class>) → [R, 2] second events at
    ``>= threshold`` (sed_scores_eval binarization, no postprocessing).
    The one change-point extraction shared by the dense-grid PSDS
    fallback and the collar/intersection F curves (curves.py)."""
    vals = df[column].values >= threshold
    if not vals.any():
        return np.zeros((0, 2))
    change = np.flatnonzero(np.diff(np.r_[0, vals.astype(np.int8), 0]))
    pairs = change.reshape(-1, 2)
    onsets = df["onset"].values
    offsets = df["offset"].values
    return np.stack([onsets[pairs[:, 0]], offsets[pairs[:, 1] - 1]],
                    axis=1)


def _intersections(det: pd.DataFrame, gt: pd.DataFrame) -> pd.DataFrame:
    """All (detection, ground-truth) pairs on the same file that overlap,
    with intersection ratios (psds_eval ``_ground_truth_intersections``)."""
    comb = pd.merge(det, gt, how="inner", on="filename",
                    suffixes=("_det", "_gt"))
    if comb.empty:
        return comb.assign(inter_duration=[], det_precision=[],
                           gt_coverage=[])
    cross = comb[(comb.onset_det <= comb.offset_gt)
                 & (comb.onset_gt <= comb.offset_det)].copy()
    cross["inter_duration"] = (
        np.minimum(cross.offset_det, cross.offset_gt)
        - np.maximum(cross.onset_det, cross.onset_gt))
    cross["det_precision"] = cross.inter_duration / cross.duration_det
    cross["gt_coverage"] = cross.inter_duration / cross.duration_gt
    return cross


class PSDSEvaluator:
    """Operating-point PSDS evaluator (psds_eval-compatible counting)."""

    def __init__(self, ground_truth: pd.DataFrame, metadata: pd.DataFrame,
                 dtc_threshold: float = 0.5, gtc_threshold: float = 0.5,
                 cttc_threshold: float = 0.0):
        gt = ground_truth.copy()
        if "event_label" not in gt:
            gt["event_label"] = "fake_event"
        gt = gt.dropna(subset=["onset", "offset", "event_label"])
        gt["duration"] = gt.offset - gt.onset
        gt["id_gt"] = np.arange(len(gt))
        self.ground_truth = gt
        self.class_names = sorted(gt.event_label.unique())
        meta = metadata.drop_duplicates("filename")
        self.dataset_duration = float(meta.duration.sum())
        self.gt_duration_per_class = {
            c: float(gt[gt.event_label == c].duration.sum())
            for c in self.class_names
        }
        self.dtc_threshold = dtc_threshold
        self.gtc_threshold = gtc_threshold
        self.cttc_threshold = cttc_threshold
        self.operating_points: list[dict] = []

    def _counts_for_class(self, det_c: pd.DataFrame, cls: str):
        """(num_tp_gts, num_fp_dets, ct_counts per other class)."""
        gt_c = self.ground_truth[self.ground_truth.event_label == cls]
        num_dets = len(det_c)
        if num_dets == 0:
            return 0, 0, {}
        det_c = det_c.copy()
        det_c["duration_det"] = det_c.offset - det_c.onset
        det_c = det_c.rename(columns={"onset": "onset_det",
                                      "offset": "offset_det"})
        det_c["id_det"] = np.arange(len(det_c))
        gt_all = self.ground_truth.rename(
            columns={"onset": "onset_gt", "offset": "offset_gt",
                     "duration": "duration_gt"})
        cross_all = _intersections(
            det_c[["filename", "onset_det", "offset_det", "duration_det",
                   "id_det"]],
            gt_all[["filename", "onset_gt", "offset_gt", "duration_gt",
                    "id_gt", "event_label"]])

        cross_same = cross_all[cross_all.event_label == cls]
        if cross_same.empty:
            dtc_valid_ids = np.array([], dtype=int)
        else:
            prec_sum = cross_same.groupby("id_det").det_precision.sum()
            dtc_valid_ids = prec_sum[
                prec_sum >= self.dtc_threshold].index.values
        num_fp = num_dets - len(dtc_valid_ids)

        if cross_same.empty:
            num_tp = 0
        else:
            valid_cross = cross_same[cross_same.id_det.isin(dtc_valid_ids)]
            if valid_cross.empty:
                num_tp = 0
            else:
                cov = valid_cross.groupby("id_gt").gt_coverage.sum()
                num_tp = int((cov >= self.gtc_threshold).sum())

        ct_counts: dict[str, int] = {}
        if self.cttc_threshold > 0:
            # cross-triggers: non-DTC-valid dets matching other classes
            failing = cross_all[~cross_all.id_det.isin(dtc_valid_ids)]
            for other in self.class_names:
                if other == cls:
                    continue
                sub = failing[failing.event_label == other]
                if sub.empty:
                    ct_counts[other] = 0
                    continue
                prec = sub.groupby("id_det").det_precision.sum()
                ct_counts[other] = int(
                    (prec >= self.cttc_threshold).sum())
        return num_tp, num_fp, ct_counts

    def add_operating_point(self, detections: pd.DataFrame,
                            info: Optional[dict] = None) -> None:
        det = detections.copy()
        if "event_label" not in det:
            det["event_label"] = "fake_event"
        point = {"info": info or {}, "per_class": {}}
        for cls in self.class_names:
            det_c = det[det.event_label == cls]
            num_tp, num_fp, ct = self._counts_for_class(det_c, cls)
            num_gts = int((self.ground_truth.event_label == cls).sum())
            tpr = num_tp / max(num_gts, 1e-15)
            fpr = num_fp / self.dataset_duration * 3600.0  # per hour
            ctr = 0.0
            others = [c for c in self.class_names if c != cls]
            if others and self.cttc_threshold > 0:
                rates = []
                for other in others:
                    dur = self.gt_duration_per_class[other]
                    rates.append(
                        ct.get(other, 0) / max(dur, 1e-15) * 3600.0)
                ctr = float(np.mean(rates))
            point["per_class"][cls] = {"tpr": tpr, "fpr": fpr, "ctr": ctr,
                                       "tp": num_tp, "fp": num_fp}
        self.operating_points.append(point)

    def psds(self, alpha_ct: float = 0.0, alpha_st: float = 0.0,
             max_efpr: Optional[float] = None):
        """PSDS value (+ ROC) over accumulated operating points."""
        if not self.operating_points:
            return 0.0, (np.zeros(1), np.zeros(1))
        per_class_points = {}
        for cls in self.class_names:
            pts = []
            for op in self.operating_points:
                st = op["per_class"][cls]
                efpr = st["fpr"] + alpha_ct * st["ctr"]
                pts.append((efpr, st["tpr"]))
            per_class_points[cls] = np.array(pts)
        return _psds_from_points(per_class_points, alpha_st, max_efpr)


def _psds_from_points(per_class_points: Dict[str, np.ndarray],
                      alpha_st: float, max_efpr: Optional[float]):
    """PSDS from per-class (eFPR, TPR) operating points.

    Each class's ROC is the running max of TPR over ascending eFPR
    (independent per-class threshold choice); curves are resampled as
    right-continuous steps on the union eFPR axis, combined as
    ``max(mu - alpha_st * sigma, 0)`` and staircase-integrated."""
    efpr_all = [pts[:, 0] for pts in per_class_points.values()]
    efpr_axis = np.unique(np.concatenate(efpr_all + [np.zeros(1)]))
    if max_efpr is None:
        max_efpr = float(efpr_axis.max()) if efpr_axis.max() > 0 else 1.0
    efpr_axis = np.r_[efpr_axis[efpr_axis < max_efpr], max_efpr]

    tpr_curves = []
    for pts in per_class_points.values():
        order = np.argsort(pts[:, 0], kind="stable")
        x = pts[order, 0]
        y = np.maximum.accumulate(pts[order, 1])
        idx = np.searchsorted(x, efpr_axis, side="right") - 1
        curve = np.where(idx >= 0, y[np.maximum(idx, 0)], 0.0)
        tpr_curves.append(curve)
    tpr_curves = np.stack(tpr_curves)            # [C, X]
    mu = tpr_curves.mean(axis=0)
    sigma = tpr_curves.std(axis=0)
    etpr = np.maximum(mu - alpha_st * sigma, 0.0)
    auc = staircase_auc(etpr, efpr_axis, max_x=max_efpr)
    return auc / max_efpr, (etpr, efpr_axis)


def compute_psds(prediction_dfs: Dict[float, pd.DataFrame],
                 ground_truth, duration,
                 dtc_threshold: float = 0.5, gtc_threshold: float = 0.5,
                 cttc_threshold: float = 0.0,
                 alpha_ct: float = 0.0, alpha_st: float = 0.0,
                 max_efpr: Optional[float] = None,
                 save_dir=None) -> float:
    """Operating-point PSDS from per-threshold prediction tables.

    Mirrors reference ``compute_psds`` (utils/eval_util.py:136-223):
    ``ground_truth`` rows carry both ``filename`` (datapoint id) and
    ``audio_id``; per-datapoint duration is the duration of its audio.
    """
    if not isinstance(ground_truth, pd.DataFrame):
        ground_truth = pd.read_csv(ground_truth, sep="\t")
    if not isinstance(duration, pd.DataFrame):
        duration = pd.read_csv(duration, sep="\t")
    aid_to_dur = dict(zip(duration["audio_id"], duration["duration"]))
    metadata = pd.DataFrame([
        {"filename": row["filename"],
         "duration": aid_to_dur[row["audio_id"]]}
        for _, row in ground_truth.iterrows()
    ])
    gt = ground_truth.drop(columns=[c for c in ("audio_id",)
                                    if c in ground_truth])
    evaluator = PSDSEvaluator(gt, metadata, dtc_threshold, gtc_threshold,
                              cttc_threshold)
    for i, k in enumerate(sorted(prediction_dfs.keys())):
        evaluator.add_operating_point(
            prediction_dfs[k], info={"name": f"Op {i+1:02d}",
                                     "threshold": k})
    value, roc = evaluator.psds(alpha_ct=alpha_ct, alpha_st=alpha_st,
                                max_efpr=max_efpr)
    if save_dir is not None:
        _plot_roc(roc, save_dir, dtc_threshold, gtc_threshold, max_efpr)
    return value


def _file_count_curves(score: np.ndarray, timestamps: np.ndarray,
                       gt_events: list, dtc: float, gtc: float):
    """Exact per-file TP/FP counts as step functions of the threshold.

    Detections for any τ equal those at the next unique score value ≥ τ,
    so evaluating at each unique score covers every distinct detection
    set (the sed_scores_eval change-point principle).  Returns
    (taus_desc, tp_counts, fp_counts) aligned arrays.
    """
    from texttoaudiogrounding_tpu.evaluation.decode import \
        find_contiguous_regions
    from texttoaudiogrounding_tpu.native import file_count_curves_native

    native = file_count_curves_native(score, timestamps, gt_events,
                                      dtc, gtc)
    if native is not None:
        return native

    uniques = np.unique(score)[::-1]  # descending
    gts = np.array([[on, off] for on, off in gt_events]) \
        if gt_events else np.zeros((0, 2))
    gt_dur = (gts[:, 1] - gts[:, 0]) if len(gts) else np.zeros(0)
    tps = np.zeros(len(uniques), np.int64)
    fps = np.zeros(len(uniques), np.int64)
    for i, tau in enumerate(uniques):
        regions = find_contiguous_regions(score >= tau)
        if len(regions) == 0:
            continue
        onsets = timestamps[regions[:, 0]]
        offsets = timestamps[regions[:, 1]]
        det_dur = offsets - onsets
        if len(gts):
            inter = (np.minimum(offsets[:, None], gts[None, :, 1])
                     - np.maximum(onsets[:, None], gts[None, :, 0]))
            inter = np.maximum(inter, 0.0)              # [D, G]
            det_prec = inter.sum(1) / np.maximum(det_dur, 1e-15)
            dtc_valid = det_prec >= dtc
            coverage = inter[dtc_valid].sum(0) / np.maximum(gt_dur, 1e-15)
            tps[i] = int((coverage >= gtc).sum())
            fps[i] = int((~dtc_valid).sum())
        else:
            fps[i] = len(regions)
    return uniques, tps, fps


def _file_count_curves_mc(score: np.ndarray, timestamps: np.ndarray,
                          gt_cls: list, gt_other: Dict[str, list],
                          dtc: float, gtc: float, cttc: float):
    """Exact per-file count curves for one class incl. cross-triggers.

    Like :func:`_file_count_curves` but additionally counts, per other
    class, detections that fail DTC yet cross-trigger-match that class's
    ground truths (summed det_precision >= cttc) — the psds_eval CTTC
    criterion (reference utils/eval_util.py:136-223 config surface).

    Cost: O(U·N) per file-class (U = unique scores) — only used when a
    cross-trigger term is active (cttc>0 AND alpha_ct!=0, i.e. the DESED
    PSDS2 scenario); all other cases route through
    :func:`_file_count_curves`.  Both sweeps run in the native C++
    kernel when available (``native/decode.cpp``; the NumPy loop below
    is the reference fallback), and ``exact=False`` in
    :func:`compute_psds_sed_scores` remains the dense-grid escape hatch.

    Returns (taus_desc, tps, fps, {other: cts}).
    """
    from texttoaudiogrounding_tpu.evaluation.decode import \
        find_contiguous_regions
    from texttoaudiogrounding_tpu.native import file_count_curves_ct_native

    native = file_count_curves_ct_native(score, timestamps, gt_cls,
                                         gt_other, dtc, gtc, cttc)
    if native is not None:
        return native

    uniques = np.unique(score)[::-1]  # descending
    gts = np.array(gt_cls, np.float64).reshape(-1, 2)
    gt_dur = gts[:, 1] - gts[:, 0]
    others = {c: np.array(v, np.float64).reshape(-1, 2)
              for c, v in gt_other.items()}
    tps = np.zeros(len(uniques), np.int64)
    fps = np.zeros(len(uniques), np.int64)
    cts = {c: np.zeros(len(uniques), np.int64) for c in others}
    for i, tau in enumerate(uniques):
        regions = find_contiguous_regions(score >= tau)
        if len(regions) == 0:
            continue
        onsets = timestamps[regions[:, 0]]
        offsets = timestamps[regions[:, 1]]
        det_dur = np.maximum(offsets - onsets, 1e-15)

        def prec_sum(gt_arr):
            if len(gt_arr) == 0:
                return np.zeros(len(onsets))
            inter = (np.minimum(offsets[:, None], gt_arr[None, :, 1])
                     - np.maximum(onsets[:, None], gt_arr[None, :, 0]))
            return np.maximum(inter, 0.0)

        inter = prec_sum(gts)                       # [D, G]
        det_prec = inter.sum(1) / det_dur if len(gts) else \
            np.zeros(len(onsets))
        dtc_valid = det_prec >= dtc
        if len(gts):
            coverage = inter[dtc_valid].sum(0) / np.maximum(gt_dur, 1e-15)
            tps[i] = int((coverage >= gtc).sum())
        fps[i] = int((~dtc_valid).sum())
        if cttc > 0 and (~dtc_valid).any():
            for c, gt_arr in others.items():
                if len(gt_arr) == 0:
                    continue
                ip = prec_sum(gt_arr)[~dtc_valid].sum(1) \
                    / det_dur[~dtc_valid]
                cts[c][i] = int((ip >= cttc).sum())
    return uniques, tps, fps, cts


def _merge_deltas(taus_all, counts_all):
    """Merge per-file descending-threshold step functions into one global
    curve: deltas vs the next-higher threshold, aggregated at identical
    thresholds, cumulative-summed over the descending sweep."""
    taus = np.concatenate(taus_all)
    uniq, inverse = np.unique(taus, return_inverse=True)
    merged = []
    for counts in counts_all:
        deltas = np.concatenate(
            [np.diff(np.r_[0, c]) for c in counts])
        d = np.bincount(inverse, weights=deltas, minlength=len(uniq))
        merged.append(np.cumsum(d[::-1]))
    return merged  # aligned to descending uniq


def exact_psd_roc(scores: Dict[str, pd.DataFrame],
                  ground_truth: Dict[str, list],
                  durations: Dict[str, float],
                  dtc_threshold: float = 0.5, gtc_threshold: float = 0.5,
                  cttc_threshold: float = 0.0, alpha_ct: float = 0.0,
                  alpha_st: float = 0.0,
                  max_efpr: Optional[float] = None):
    """Exact threshold-free multi-class PSD-ROC (sed_scores_eval
    ``intersection_based.psd_roc`` semantics — reference
    utils/eval_util.py:226-292, evaluate_on_desed.py:198-214).

    Per class, every distinct detection set is enumerated at the score
    change points of every file, counts (TP / FP / cross-triggers per
    other class) are merged globally as threshold-sorted deltas, and the
    per-class (eFPR, TPR) curves are combined exactly as the
    operating-point evaluator does — so this equals the dense-grid path
    in the limit of an infinitely fine grid, with no grid error.
    """
    total_duration = float(sum(durations.values()))
    # class set = GT labels UNION score event columns: a class scored but
    # absent from GT still contributes a TPR=0 curve with FP-driven eFPR
    # (sed_scores_eval takes classes from the score frames)
    classes = sorted({label for evs in ground_truth.values()
                      for *_, label in evs}
                     | {c for df in scores.values() for c in df.columns
                        if c not in ("onset", "offset")})
    gt_by_fc = {fname: {} for fname in scores}
    num_gts = {c: 0 for c in classes}
    gt_dur = {c: 0.0 for c in classes}
    for fname, evs in ground_truth.items():
        for on, off, label in evs:
            gt_by_fc.setdefault(fname, {}).setdefault(label, []).append(
                (on, off))
            num_gts[label] += 1
            gt_dur[label] += off - on

    use_ct = cttc_threshold > 0.0 and alpha_ct != 0.0
    per_class_points = {}
    for cls in classes:
        taus_all, tp_all, fp_all = [], [], []
        ct_all = {c: [] for c in classes if c != cls} if use_ct else {}
        for fname, df in scores.items():
            if cls not in df.columns:
                continue
            score = df[cls].values
            timestamps = np.r_[df["onset"].values, df["offset"].values[-1]]
            by_c = gt_by_fc.get(fname, {})
            if not use_ct:
                # no cross-trigger term: the fast (native-accelerated)
                # single-class change-point sweep is exact here, and
                # the C-1 all-zero CT curves are skipped entirely (not
                # merged and discarded)
                taus, tps, fps = _file_count_curves(
                    score, timestamps, by_c.get(cls, []),
                    dtc_threshold, gtc_threshold)
            else:
                taus, tps, fps, cts = _file_count_curves_mc(
                    score, timestamps, by_c.get(cls, []),
                    {c: by_c.get(c, []) for c in ct_all},
                    dtc_threshold, gtc_threshold, cttc_threshold)
                for c in ct_all:
                    ct_all[c].append(cts[c])
            taus_all.append(taus)
            tp_all.append(tps)
            fp_all.append(fps)
        if not taus_all:
            per_class_points[cls] = np.zeros((1, 2))
            continue
        merged = _merge_deltas(
            taus_all, [tp_all, fp_all] + [ct_all[c] for c in ct_all])
        tp, fp = merged[0], merged[1]
        tpr = tp / max(num_gts[cls], 1e-15)
        efpr = fp / max(total_duration, 1e-15) * 3600.0
        if ct_all and cttc_threshold > 0 and alpha_ct != 0.0:
            rates = [merged[2 + k] / max(gt_dur[c], 1e-15) * 3600.0
                     for k, c in enumerate(ct_all)]
            efpr = efpr + alpha_ct * np.mean(rates, axis=0)
        per_class_points[cls] = np.stack([efpr, tpr], axis=1)
    return _psds_from_points(per_class_points, alpha_st, max_efpr)


def exact_single_class_psd_roc(scores: Dict[str, pd.DataFrame],
                               ground_truth: Dict[str, list],
                               durations: Dict[str, float],
                               dtc_threshold: float = 0.5,
                               gtc_threshold: float = 0.5,
                               max_efpr: Optional[float] = None,
                               event_class: str = "fake_event"):
    """Threshold-free single-class PSDS (sed_scores_eval semantics).

    A global change-point sweep: per-file step-function TP/FP counts are
    merged as deltas sorted by descending threshold, giving the exact
    (eTPR, eFPR) curve at every distinct operating point.  Reference path:
    utils/eval_util.py:226-292.
    """
    total_duration = float(sum(durations.values()))
    num_gts = sum(len(v) for v in ground_truth.values())
    taus_all, dtp_all, dfp_all = [], [], []
    for fname, df in scores.items():
        score = df[event_class].values
        timestamps = np.r_[df["onset"].values, df["offset"].values[-1]]
        gt_events = [(on, off) for on, off, *_ in
                     ground_truth.get(fname, [])]
        taus, tps, fps = _file_count_curves(
            score, timestamps, gt_events, dtc_threshold, gtc_threshold)
        # deltas vs the next-higher threshold (counts above max are 0)
        dtp = np.diff(np.r_[0, tps])
        dfp = np.diff(np.r_[0, fps])
        taus_all.append(taus)
        dtp_all.append(dtp)
        dfp_all.append(dfp)
    if not taus_all:
        return 0.0, (np.zeros(1), np.zeros(1))
    taus = np.concatenate(taus_all)
    dtp = np.concatenate(dtp_all)
    dfp = np.concatenate(dfp_all)
    # aggregate deltas at identical thresholds FIRST — applying ties
    # one-by-one would create fictional intermediate operating points
    uniq, inverse = np.unique(taus, return_inverse=True)
    tp_d = np.bincount(inverse, weights=dtp, minlength=len(uniq))
    fp_d = np.bincount(inverse, weights=dfp, minlength=len(uniq))
    # descending threshold sweep
    tp = np.cumsum(tp_d[::-1])
    fp = np.cumsum(fp_d[::-1])
    tpr = tp / max(num_gts, 1e-15)
    efpr = fp / max(total_duration, 1e-15) * 3600.0
    if max_efpr is None:
        max_efpr = float(efpr.max()) if efpr.max() > 0 else 1.0
    # single-class ROC: monotonize — the PSD-ROC is the envelope of
    # operating points (change-point deltas can be negative, so the
    # raw cumsum curve may dip); sed_scores_eval cummaxes single-class
    # rocs the same way
    auc = staircase_auc(tpr, efpr, max_x=max_efpr, monotonize=True)
    return auc / max_efpr, (tpr, efpr)


def compute_psds_sed_scores(scores: Dict[str, pd.DataFrame],
                            ground_truth: Dict[str, list],
                            duration, fname_to_aid: Dict[str, str],
                            dtc_threshold: float = 0.5,
                            gtc_threshold: float = 0.5,
                            cttc_threshold: float = 0.0,
                            alpha_ct: float = 0.0,
                            alpha_st: float = 0.0,
                            max_efpr: Optional[float] = None,
                            num_thresholds: int = 200,
                            exact: bool = True,
                            save_dir=None) -> float:
    """Threshold-resolved PSDS over score curves (sed_scores_eval path).

    Mirrors reference ``compute_psds_sed_scores`` (utils/eval_util.py:
    250-292): ``scores[fname]`` is a DataFrame with columns
    (onset, offset, <event>...) of per-frame scores; ground_truth[fname] is
    a list of (onset, offset, event) tuples.  Threshold-free change-point
    enumeration (sed_scores_eval semantics, ``>= threshold``
    binarization, no median filtering) — exact for any number of classes
    incl. CTTC / alpha_ct / alpha_st (the DESED PSDS2 scenario).
    ``exact=False`` falls back to a dense uniform ``num_thresholds`` grid
    through the operating-point evaluator (kept for cross-validation).
    """
    if not isinstance(duration, pd.DataFrame):
        duration = pd.read_csv(duration, sep="\t")
    aid_to_dur = dict(zip(duration["audio_id"], duration["duration"]))

    # single-class grounding with alpha_ct = alpha_st = 0: use the exact
    # threshold-free change-point sweep (no grid approximation)
    event_cols_set = {tuple(c for c in df.columns
                            if c not in ("onset", "offset"))
                      for df in scores.values()}
    if (len(event_cols_set) == 1 and len(next(iter(event_cols_set))) == 1
            and alpha_ct == 0.0 and alpha_st == 0.0
            and cttc_threshold == 0.0):
        event_class = next(iter(event_cols_set))[0]
        durations = {fname: aid_to_dur[fname_to_aid[fname]]
                     for fname in scores}
        value, roc = exact_single_class_psd_roc(
            scores, ground_truth, durations,
            dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
            max_efpr=max_efpr, event_class=event_class)
        if save_dir is not None:
            _plot_roc((roc[0], roc[1]), save_dir, dtc_threshold,
                      gtc_threshold, max_efpr, prefix="PSDS_sedscores")
        return value

    if exact:
        durations = {fname: aid_to_dur[fname_to_aid[fname]]
                     for fname in scores}
        value, roc = exact_psd_roc(
            scores, ground_truth, durations,
            dtc_threshold=dtc_threshold, gtc_threshold=gtc_threshold,
            cttc_threshold=cttc_threshold, alpha_ct=alpha_ct,
            alpha_st=alpha_st, max_efpr=max_efpr)
        if save_dir is not None:
            _plot_roc(roc, save_dir, dtc_threshold, gtc_threshold,
                      max_efpr, prefix="PSDS_sedscores")
        return value

    gt_rows = []
    for fname, events in ground_truth.items():
        for onset, offset, label in events:
            gt_rows.append({"filename": fname, "onset": onset,
                            "offset": offset, "event_label": label})
    gt_df = pd.DataFrame(gt_rows)
    metadata = pd.DataFrame([
        {"filename": fname, "duration": aid_to_dur[fname_to_aid[fname]]}
        for fname in ground_truth
    ])
    evaluator = PSDSEvaluator(gt_df, metadata, dtc_threshold, gtc_threshold,
                              cttc_threshold)

    thresholds = np.linspace(0.0, 1.0, num_thresholds + 1)[1:-1]
    event_cols = {}
    for fname, df in scores.items():
        event_cols[fname] = [c for c in df.columns
                             if c not in ("onset", "offset")]
    for th in thresholds:
        rows = []
        for fname, df in scores.items():
            for col in event_cols[fname]:
                for onset, offset in events_at_threshold(df, col, th):
                    rows.append({"filename": fname, "onset": onset,
                                 "offset": offset, "event_label": col})
        det = pd.DataFrame(rows, columns=["filename", "onset", "offset",
                                          "event_label"])
        evaluator.add_operating_point(det, info={"threshold": th})
    value, roc = evaluator.psds(alpha_ct=alpha_ct, alpha_st=alpha_st,
                                max_efpr=max_efpr)
    if save_dir is not None:
        _plot_roc(roc, save_dir, dtc_threshold, gtc_threshold, max_efpr,
                  prefix="PSDS_sedscores")
    return value


def _plot_roc(roc, save_dir, dtc, gtc, max_efpr, prefix="PSDS"):
    from pathlib import Path

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    etpr, efpr = roc
    plt.figure(figsize=(16, 4))
    plt.step(efpr, etpr, lw=2, where="post")
    plt.xlabel("eFPR per hour")
    plt.ylabel("eTPR")
    plt.savefig(save_dir / f"{prefix}_dtc{dtc}_gtc{gtc}_"
                f"maxefpr{max_efpr}.png")
    plt.close()
