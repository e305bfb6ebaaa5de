"""Metric engine vs hand-computed cases (replaces psds_eval /
sed_scores_eval / sed_eval golden behavior)."""

import numpy as np
import pandas as pd
import pytest

from texttoaudiogrounding_tpu.evaluation import (
    GroundingPrecisionRecall,
    PSDSEvaluator,
    compute_psds,
    compute_sed_eval,
    compute_th_auc,
    connect_clusters,
    decode_multi_threshold,
    find_contiguous_regions,
    median_filter,
    staircase_auc,
)


def test_find_contiguous_regions():
    arr = np.array([0, 1, 1, 0, 0, 1, 0, 1], bool)
    np.testing.assert_array_equal(find_contiguous_regions(arr),
                                  [[1, 3], [5, 6], [7, 8]])
    np.testing.assert_array_equal(
        find_contiguous_regions(np.array([1, 1, 0], bool)), [[0, 2]])
    np.testing.assert_array_equal(
        find_contiguous_regions(np.array([0, 0], bool)),
        np.zeros((0, 2), int))


def test_connect_clusters():
    x = np.array([1, 1, 0, 1, 0, 0, 0, 1])
    # gap of 1 between [0,2) and [3,4) merges; gap of 3 does not
    np.testing.assert_array_equal(connect_clusters(x, n=1),
                                  [1, 1, 1, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(connect_clusters(x, n=3),
                                  [1, 1, 1, 1, 1, 1, 1, 1])


def test_median_filter_dispatch():
    x = np.array([[0.9, 0.1, 0.9, 0.9, 0.1]])  # [1, T]
    out = median_filter(x, window_size=3, threshold=0.5)
    assert out.shape == x.shape
    # isolated dip at index 1 survives a 3-median? [1,0,1] → median 1
    np.testing.assert_array_equal(out[0], [1, 1, 1, 1, 0])


def test_decode_multi_threshold():
    scores = np.array([0.1, 0.8, 0.9, 0.85, 0.1, 0.1, 0.6, 0.6, 0.1])
    segs = decode_multi_threshold(scores, np.array([0.5]), window_size=1,
                                  connect_n=1, time_resolution=0.04)
    np.testing.assert_allclose(segs[0], [[1 * 0.04, 4 * 0.04],
                                         [6 * 0.04, 8 * 0.04]])
    # higher threshold keeps only the first burst
    segs = decode_multi_threshold(scores, np.array([0.7]), window_size=1,
                                  time_resolution=1.0)
    np.testing.assert_allclose(segs[0], [[1, 4]])
    # connect_n=2 merges the two bursts (gap of 2 frames)
    segs = decode_multi_threshold(scores, np.array([0.5]), window_size=1,
                                  connect_n=2, time_resolution=1.0)
    np.testing.assert_allclose(segs[0], [[1, 8]])


def test_staircase_auc():
    # step function: y=0.5 on [0,10), y=1.0 on [10,20)
    assert staircase_auc(np.array([0.5, 1.0]), np.array([0.0, 10.0]),
                         max_x=20.0) == pytest.approx(15.0)
    # a dipping curve integrates its dip (sed_scores_eval semantics —
    # no re-monotonization of the integrated curve)...
    assert staircase_auc(np.array([1.0, 0.2]), np.array([0.0, 10.0]),
                         max_x=20.0) == pytest.approx(12.0)
    # ...unless the caller asks for the ROC-envelope semantics
    assert staircase_auc(np.array([1.0, 0.2]), np.array([0.0, 10.0]),
                         max_x=20.0, monotonize=True) == pytest.approx(20.0)


def _gt_meta():
    gt = pd.DataFrame([{"filename": "f1", "onset": 0.0, "offset": 10.0}])
    meta = pd.DataFrame([{"filename": "f1", "duration": 60.0},
                         {"filename": "f2", "duration": 60.0}])
    return gt, meta


def test_psds_perfect_detection():
    gt, meta = _gt_meta()
    ev = PSDSEvaluator(gt, meta, 0.5, 0.5)
    ev.add_operating_point(pd.DataFrame(
        [{"filename": "f1", "onset": 0.0, "offset": 10.0}]))
    value, _ = ev.psds(max_efpr=100.0)
    assert value == pytest.approx(1.0)


def test_psds_dtc_gtc_criteria():
    gt, meta = _gt_meta()
    # det inside gt: DTC ok (precision 1) but covers only 40% → no TP, no FP
    ev = PSDSEvaluator(gt, meta, 0.5, 0.5)
    ev.add_operating_point(pd.DataFrame(
        [{"filename": "f1", "onset": 0.0, "offset": 4.0}]))
    value, _ = ev.psds(max_efpr=100.0)
    assert value == pytest.approx(0.0)
    op = ev.operating_points[0]["per_class"]["fake_event"]
    assert op["tpr"] == 0.0 and op["fpr"] == 0.0

    # non-overlapping det: FP → eFPR = 1 / 120 s = 30/h
    ev2 = PSDSEvaluator(gt, meta, 0.5, 0.5)
    ev2.add_operating_point(pd.DataFrame(
        [{"filename": "f2", "onset": 20.0, "offset": 30.0}]))
    op = ev2.operating_points[0]["per_class"]["fake_event"]
    assert op["fpr"] == pytest.approx(30.0)
    # half the area is below eFPR=30 where TPR=0
    value, _ = ev2.psds(max_efpr=100.0)
    assert value == pytest.approx(0.0)


def test_psds_split_detections_sum_dtc():
    """Two half-covering detections jointly satisfy GTC (sums, not single
    best match) — the defining PSDS property."""
    gt, meta = _gt_meta()
    ev = PSDSEvaluator(gt, meta, 0.5, 0.5)
    ev.add_operating_point(pd.DataFrame(
        [{"filename": "f1", "onset": 0.0, "offset": 3.0},
         {"filename": "f1", "onset": 3.0, "offset": 6.0}]))
    op = ev.operating_points[0]["per_class"]["fake_event"]
    assert op["tpr"] == pytest.approx(1.0)  # 3/10 + 3/10 = 0.6 ≥ 0.5
    assert op["fpr"] == 0.0


def test_psds_multiple_ops_roc():
    gt, meta = _gt_meta()
    ev = PSDSEvaluator(gt, meta, 0.5, 0.5)
    # op1: perfect (eFPR 0, TPR 1); op2: one FP (eFPR 30, TPR 1)
    ev.add_operating_point(pd.DataFrame(
        [{"filename": "f1", "onset": 0.0, "offset": 10.0}]))
    ev.add_operating_point(pd.DataFrame(
        [{"filename": "f1", "onset": 0.0, "offset": 10.0},
         {"filename": "f2", "onset": 20.0, "offset": 30.0}]))
    value, _ = ev.psds(max_efpr=100.0)
    assert value == pytest.approx(1.0)


def test_compute_psds_wrapper():
    gt = pd.DataFrame([
        {"filename": "q1", "audio_id": "a1", "onset": 0.0, "offset": 5.0},
    ])
    dur = pd.DataFrame([{"audio_id": "a1", "duration": 10.0}])
    preds = {0.5: pd.DataFrame(
        [{"filename": "q1", "onset": 0.0, "offset": 5.0}])}
    value = compute_psds(preds, gt, dur, max_efpr=100.0)
    assert value == pytest.approx(1.0)


def test_th_auc_hand_case():
    gt = pd.DataFrame([
        {"filename": "f1", "onset": 0.0, "offset": 10.0},
        {"filename": "f2", "onset": 0.0, "offset": 10.0},
    ])
    # th 0.2: both gts found perfectly + 1 spurious det → P=2/3, R=1
    # th 0.8: only f1 found → P=1, R=0.5
    preds = {
        0.2: pd.DataFrame([
            {"filename": "f1", "onset": 0.0, "offset": 10.0},
            {"filename": "f2", "onset": 0.0, "offset": 10.0},
            {"filename": "f2", "onset": 30.0, "offset": 40.0},
        ]),
        0.8: pd.DataFrame([
            {"filename": "f1", "onset": 0.0, "offset": 10.0},
        ]),
    }
    value = compute_th_auc(preds, gt, min_threshold=0.0, max_threshold=1.0)
    f_02 = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
    f_08 = 2 * 1.0 * 0.5 / 1.5
    expected = 0.5 * (f_02 + f_08) * (0.8 - 0.2) / 1.0  # trapezoid
    assert value == pytest.approx(expected)


def test_th_auc_precision_uses_all_dets():
    """Precision criterion counts dets valid against gts that pass GTC from
    ALL detections (reference :594-626), not only DTC-valid ones."""
    gt = pd.DataFrame([{"filename": "f1", "onset": 0.0, "offset": 10.0}])
    ev = GroundingPrecisionRecall(0.5, 0.5, gt)
    # two dets: [0,3] and [3,6] — each alone covers 30% (GTC fails per det)
    # but together 60% passes GTC; both dets have precision 1 ≥ dtc
    ev.add_operating_point(pd.DataFrame([
        {"filename": "f1", "onset": 0.0, "offset": 3.0},
        {"filename": "f1", "onset": 3.0, "offset": 6.0},
    ]), info={"threshold": 0.5})
    op = ev.operating_points[0]
    assert op["recall"] == pytest.approx(1.0)
    assert op["precision"] == pytest.approx(1.0)


def test_sed_eval_metrics():
    ref = pd.DataFrame([
        {"filename": "f1", "onset": 1.0, "offset": 3.0,
         "event_label": "dog"},
        {"filename": "f1", "onset": 5.0, "offset": 6.0,
         "event_label": "cat"},
    ])
    est = pd.DataFrame([
        {"filename": "f1", "onset": 1.1, "offset": 3.1,
         "event_label": "dog"},   # within collar 0.2
        {"filename": "f1", "onset": 5.5, "offset": 6.5,
         "event_label": "cat"},   # onset off by 0.5 > collar → FP+FN
    ])
    event, segment = compute_sed_eval(ref, est)
    assert event["class_wise"]["dog"]["f_measure"] == pytest.approx(1.0)
    assert event["class_wise"]["cat"]["f_measure"] == pytest.approx(0.0)
    assert event["overall"]["f_measure"] == pytest.approx(0.5)
    # segment-based: dog ref active in segments {1,2}, est in {1,2,3}
    # (3.1 s offset spills into segment 3) → tp=2, fp=1, fn=0 → F=0.8
    assert segment["class_wise"]["dog"]["f_measure"] == pytest.approx(0.8)


def test_exact_psd_roc_matches_dense_grid(rng):
    """The change-point sweep must agree with a fine dense-threshold grid
    through the operating-point engine (grid → exact as it refines)."""
    import pandas as pd

    from texttoaudiogrounding_tpu.evaluation.psds import (
        compute_psds_sed_scores,
        exact_single_class_psd_roc,
    )

    res = 0.1
    scores, gt, durations = {}, {}, {}
    for i in range(6):
        fname = f"f{i}"
        track = np.round(rng.uniform(size=80), 2)  # few unique values
        track[20:50] += 0.5
        track = np.clip(track, 0, 1)
        t = np.arange(81) * res
        scores[fname] = pd.DataFrame({"onset": t[:-1], "offset": t[1:],
                                      "fake_event": track})
        gt[fname] = [(2.0, 5.0, "fake_event")]
        durations[fname] = 8.0

    exact, _ = exact_single_class_psd_roc(scores, gt, durations,
                                          max_efpr=100.0)
    # dense grid through the generic evaluator (force the non-exact path
    # by calling the operating-point engine directly)
    dur_df = pd.DataFrame([{"audio_id": k, "duration": v}
                           for k, v in durations.items()])
    gt_rows = [{"filename": f, "onset": on, "offset": off,
                "event_label": lbl}
               for f, evs in gt.items() for on, off, lbl in evs]
    meta = pd.DataFrame([{"filename": f, "duration": durations[f]}
                         for f in scores])
    ev = PSDSEvaluator(pd.DataFrame(gt_rows), meta, 0.5, 0.5)
    for th in np.linspace(0.001, 0.999, 400):
        rows = []
        for fname, df in scores.items():
            vals = df["fake_event"].values >= th
            if not vals.any():
                continue
            change = np.flatnonzero(np.diff(np.r_[0, vals.astype(int), 0]))
            for lo, hi in change.reshape(-1, 2):
                rows.append({"filename": fname,
                             "onset": df["onset"].values[lo],
                             "offset": df["offset"].values[hi - 1],
                             "event_label": "fake_event"})
        ev.add_operating_point(pd.DataFrame(
            rows, columns=["filename", "onset", "offset", "event_label"]))
    dense, _ = ev.psds(max_efpr=100.0)
    assert exact == pytest.approx(dense, abs=0.02)

    # the public wrapper routes single-class to the exact path
    value = compute_psds_sed_scores(
        scores, gt, dur_df, {f: f for f in scores}, max_efpr=100.0)
    assert value == pytest.approx(exact)


def test_perfect_scores_beat_random_end_to_end(rng):
    """Decode + PSDS + th-AUC pipeline: oracle scores must beat random
    (the reference's evaluate_random sanity floor, run_strong.py:279-380)."""
    time_res = 0.04
    n_frames = 250
    thresholds = np.arange(1, 10) / 10.0
    gt_rows, all_scores = [], {}
    for i in range(8):
        on = rng.uniform(1.0, 4.0)
        off = on + rng.uniform(1.0, 3.0)
        fname = f"q{i}"
        gt_rows.append({"filename": fname, "audio_id": f"a{i}",
                        "onset": round(on, 2), "offset": round(off, 2)})
        oracle = np.zeros(n_frames, np.float32)
        oracle[int(on / time_res):int(off / time_res)] = 0.95
        all_scores[fname] = {"oracle": oracle,
                             "random": rng.uniform(size=n_frames)}
    gt = pd.DataFrame(gt_rows)
    dur = pd.DataFrame([{"audio_id": f"a{i}", "duration": 10.0}
                        for i in range(8)])

    results = {}
    for kind in ("oracle", "random"):
        preds = {th: [] for th in thresholds}
        for fname, scores in all_scores.items():
            segs = decode_multi_threshold(scores[kind], thresholds,
                                          window_size=1, connect_n=13,
                                          time_resolution=time_res)
            for th, seg in zip(thresholds, segs):
                for onset, offset in seg:
                    preds[th].append({"filename": fname, "onset": onset,
                                      "offset": offset})
        pred_dfs = {th: pd.DataFrame(
            rows, columns=["filename", "onset", "offset"])
            for th, rows in preds.items()}
        results[kind] = {
            "psds": compute_psds(pred_dfs, gt, dur, max_efpr=100.0),
            "th_auc": compute_th_auc(pred_dfs, gt),
        }
    assert results["oracle"]["psds"] > 0.9
    # F=1 at each of the 9 thresholds → trapezoid over [0.1, 0.9] = 0.8
    assert results["oracle"]["th_auc"] == pytest.approx(0.8)
    assert results["oracle"]["psds"] > results["random"]["psds"] + 0.3
    assert results["oracle"]["th_auc"] > results["random"]["th_auc"] + 0.3


def test_exact_multiclass_psd_roc_matches_dense_grid(rng):
    """DESED-PSDS2-shaped scenario (multi-class, cttc=0.3, alpha_ct=0.5,
    alpha_st=1): the exact change-point path must agree with the dense
    grid when the scores are quantized onto the grid (both are then
    error-free), and the public wrapper must route to it."""
    import pandas as pd

    from texttoaudiogrounding_tpu.evaluation.psds import (
        compute_psds_sed_scores,
        exact_psd_roc,
    )

    res = 0.1
    classes = ["dog", "cat", "speech"]
    # scores quantized to multiples of 0.05 = exact grid points of the
    # 800-step dense sweep, with min > 0, so both paths evaluate the
    # identical operating-point set (incl. the all-active one)
    grid = np.linspace(0.0, 1.0, 21)
    n_frames = 400  # sparse gt (<10% of the clip) so dtc=0.1 can fail
    scores, gt, durations = {}, {}, {}
    for i in range(5):
        fname = f"f{i}"
        t = np.arange(n_frames + 1) * res
        data = {"onset": t[:-1], "offset": t[1:]}
        gt[fname] = []
        for k, cls in enumerate(classes):
            track = grid[rng.integers(1, 10, size=n_frames)]
            lo = 100 * k + 10 * i
            track[lo:lo + 8] = grid[rng.integers(12, 21, size=8)]
            data[cls] = track
            gt[fname].append((lo * res, (lo + 8) * res, cls))
        # an extra event of another class to exercise cross-triggers
        gt[fname].append((0.5, 1.3, classes[(i + 1) % 3]))
        scores[fname] = pd.DataFrame(data)
        durations[fname] = n_frames * res

    kw = dict(dtc_threshold=0.1, gtc_threshold=0.1, cttc_threshold=0.3,
              alpha_ct=0.5, alpha_st=1.0, max_efpr=100.0)
    exact, _ = exact_psd_roc(scores, gt, durations, **kw)

    dur_df = pd.DataFrame([{"audio_id": k, "duration": v}
                           for k, v in durations.items()])
    dense = compute_psds_sed_scores(
        scores, gt, dur_df, {f: f for f in scores}, exact=False,
        num_thresholds=800, **kw)
    assert 0.0 < exact <= 1.0
    assert exact == pytest.approx(dense, abs=1e-6)

    routed = compute_psds_sed_scores(
        scores, gt, dur_df, {f: f for f in scores}, **kw)
    assert routed == pytest.approx(exact)


def test_psds_cttc_hand_case():
    """Fully hand-derived CTTC scenario (psds_eval semantics).

    File of 100 s; GT: A=(0,10), B=(50,60).  Dets for A: (0,10) — DTC
    valid, covers A's GT -> TP; (50,58) — fails DTC (precision 0 vs A),
    cross-trigger-matches B (8/8 >= cttc 0.3) -> FP + 1 CT.  Hence
    TPR_A=1, FPR_A=1/100s=36/h, CTR_{A,B}=1/10s=360/h, eFPR_A=36+0.5*360
    =216; class B has no dets.  With alpha_st=0, max_efpr=400:
    mu=0.5 over [216,400) -> PSDS = 0.5*(400-216)/400 = 0.23.
    """
    gt = pd.DataFrame([
        {"filename": "f", "onset": 0.0, "offset": 10.0,
         "event_label": "A"},
        {"filename": "f", "onset": 50.0, "offset": 60.0,
         "event_label": "B"},
    ])
    meta = pd.DataFrame([{"filename": "f", "duration": 100.0}])
    ev = PSDSEvaluator(gt, meta, dtc_threshold=0.5, gtc_threshold=0.5,
                       cttc_threshold=0.3)
    det = pd.DataFrame([
        {"filename": "f", "onset": 0.0, "offset": 10.0,
         "event_label": "A"},
        {"filename": "f", "onset": 50.0, "offset": 58.0,
         "event_label": "A"},
    ])
    ev.add_operating_point(det)
    st = ev.operating_points[0]["per_class"]["A"]
    assert st["tpr"] == pytest.approx(1.0)
    assert st["fpr"] == pytest.approx(36.0)
    assert st["ctr"] == pytest.approx(360.0)
    value, _roc = ev.psds(alpha_ct=0.5, alpha_st=0.0, max_efpr=400)
    assert value == pytest.approx(0.23, abs=1e-6)


def test_exact_sweep_hand_case():
    """Hand-derived threshold-free single-class sweep: 4 one-second
    frames scored [0.9, 0.2, 0.9, 0.1], GT (0,1).  tau=0.9: dets (0,1)
    TP + (2,3) FP; tau<=0.2: one merged det failing DTC (FP only).
    Best point (eFPR=900/h, TPR=1) -> PSDS@1000 = (1000-900)/1000.
    """
    from texttoaudiogrounding_tpu.evaluation.psds import (
        exact_single_class_psd_roc,
    )

    scores = {"f": pd.DataFrame({
        "onset": [0.0, 1.0, 2.0, 3.0],
        "offset": [1.0, 2.0, 3.0, 4.0],
        "fake_event": [0.9, 0.2, 0.9, 0.1]})}
    gt = {"f": [(0.0, 1.0, "fake_event")]}
    value, (tpr, efpr) = exact_single_class_psd_roc(
        scores, gt, {"f": 4.0}, dtc_threshold=0.5, gtc_threshold=0.5,
        max_efpr=1000.0)
    assert value == pytest.approx(0.1, abs=1e-9)
    # the operating points themselves
    pts = sorted(zip(efpr.tolist(), tpr.tolist()))
    assert (900.0, 1.0) in pts


def test_effective_tpr_dip_is_integrated_not_cummaxed():
    """With alpha_st > 0 the effective TPR (mu - sigma) can DIP when one
    class improves and the others stall (sigma grows faster than mu);
    sed_scores_eval integrates the dip — re-monotonizing it inflates
    PSDS.  3 classes at TPR 0.5; class A reaches 1.0 at eFPR 5:
    etpr = 0.5 on [0,5), then 2/3 - sqrt(1/18) ~= 0.43097 on [5,10)."""
    from texttoaudiogrounding_tpu.evaluation.psds import _psds_from_points

    pts = {
        "A": np.array([[0.0, 0.5], [5.0, 1.0]]),
        "B": np.array([[0.0, 0.5]]),
        "C": np.array([[0.0, 0.5]]),
    }
    value, (etpr, axis) = _psds_from_points(pts, alpha_st=1.0,
                                            max_efpr=10.0)
    dipped = 2.0 / 3.0 - np.sqrt(1.0 / 18.0)
    assert etpr.min() == pytest.approx(dipped, abs=1e-9)
    assert value == pytest.approx((0.5 * 5 + dipped * 5) / 10, abs=1e-9)


def test_desed_macro_f1_never_exceeds_one():
    """psds_eval compute_macro_f_score counting: one detection covering
    two ground truths gives TP=2, FP=0, FN=0 -> F1 = 1.0 (dividing the
    GT-counted TP by the detection count would give 4/3)."""
    from texttoaudiogrounding_tpu.evaluation.desed import (
        evaluate_desed_macro_f1,
    )

    frames = np.zeros(12, np.float32)
    frames[:10] = 0.9          # one detection [0, 10) at th 0.75/0.25
    df = pd.DataFrame({"c": frames})
    result = evaluate_desed_macro_f1(
        {"f1": df}, {"f1": [(0.0, 4.0, "c"), (5.0, 9.0, "c")]},
        {"f1": 12.0}, thresholds=(0.75, 0.25), time_resolution=1.0,
        classes=["c"])
    assert result["class_f1"]["c"] == pytest.approx(1.0)
    assert result["macro_f1"] <= 1.0
