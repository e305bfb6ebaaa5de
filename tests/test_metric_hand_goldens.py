"""Hand-derived metric goldens: every expected value in this file is
computed BY HAND in the test body (arithmetic spelled out), never by the
engine under test — pinning the metric engine to the psds_eval /
sed_scores_eval / sed_eval *definitions* without needing the libraries
(absent from this image; the library-fixture harness in
test_metric_goldens.py remains for environments that have them).

Reference semantics being pinned: utils/eval_util.py:136-332 (psds_eval
operating-point counting + sed_scores threshold-free sweep) and
utils/eval_util.py:354-425 (sed_eval F1s).
"""

import numpy as np
import pandas as pd
import pytest


def _df(rows, cols=("filename", "onset", "offset", "event_label")):
    return pd.DataFrame([dict(zip(cols, r)) for r in rows])


# --------------------------------------------------------- psds_eval path

def test_psds_operating_points_single_class_hand():
    """2 files x 1 h, one class; two operating points.

    OP(th=0.5): dets f1[0,5] (TP), f2[10,14] (TP), f2[20,22] (no GT
    overlap -> FP).  TPR = 2/2 = 1, eFPR = 1 FP / 2 h = 0.5/h.
    OP(th=0.9): dets f1[0,5] (TP).  TPR = 1/2, eFPR = 0.
    ROC (running max of TPR over eFPR): 0.5 on [0, 0.5), 1.0 on
    [0.5, 100] -> PSDS = (0.5*0.5 + 99.5*1.0) / 100 = 0.9975.
    """
    from texttoaudiogrounding_tpu.evaluation import compute_psds

    gt = _df([("f1", 0.0, 5.0, "a"), ("f2", 10.0, 14.0, "a")])
    gt["audio_id"] = ["a1", "a2"]
    duration = pd.DataFrame({"audio_id": ["a1", "a2"],
                             "duration": [3600.0, 3600.0]})
    preds = {
        0.5: _df([("f1", 0.0, 5.0, "a"), ("f2", 10.0, 14.0, "a"),
                  ("f2", 20.0, 22.0, "a")]),
        0.9: _df([("f1", 0.0, 5.0, "a")]),
    }
    value = compute_psds(preds, gt, duration, dtc_threshold=0.5,
                         gtc_threshold=0.5, cttc_threshold=0.0,
                         alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    expected = (0.5 * 0.5 + 99.5 * 1.0) / 100.0
    np.testing.assert_allclose(value, expected, rtol=1e-9)


def test_psds_operating_points_cttc_alpha_hand():
    """2 classes, cross-triggers, alpha_ct=0.5, alpha_st=1.

    GT: f1: a[0,10], b[100,110]; f2: a[0,10], b[50,60] (1 h files,
    dataset = 2 h; per-class GT duration: a 20 s, b 20 s).

    OP(th=0.5): a-dets f1[0,10] (TP), f2[0,10] (TP), f2[50,58] (no a-GT
    overlap -> FP; overlaps b's f2[50,60] by 8/8 = 1.0 >= cttc 0.3 ->
    one cross-trigger on b).  b-dets f1[100,110], f2[50,60] (both TP).
      class a: TPR 1, fpr = 1/2h = 0.5/h, ctr = 1 CT / 20 s of b-GT
      = 180/h -> eFPR = 0.5 + 0.5*180 = 90.5.  class b: TPR 1, eFPR 0.
    OP(th=0.9): a-dets f1[0,10]; b-dets f2[50,60] -> both classes
      TPR 0.5 at eFPR 0.

    Curves on the union axis [0, 90.5, 100]: a = [0.5, 1, 1],
    b = [1, 1, 1]; mu = [0.75, 1], sigma = [0.25, 0]; eTPR with
    alpha_st=1 -> [0.5, 1.0]; PSDS = (0.5*90.5 + 1.0*9.5)/100 = 0.5475.
    """
    from texttoaudiogrounding_tpu.evaluation import compute_psds
    from texttoaudiogrounding_tpu.evaluation.psds import PSDSEvaluator

    gt = _df([("f1", 0.0, 10.0, "a"), ("f1", 100.0, 110.0, "b"),
              ("f2", 0.0, 10.0, "a"), ("f2", 50.0, 60.0, "b")])
    gt["audio_id"] = ["a1", "a1", "a2", "a2"]
    duration = pd.DataFrame({"audio_id": ["a1", "a2"],
                             "duration": [3600.0, 3600.0]})
    preds = {
        0.5: _df([("f1", 0.0, 10.0, "a"), ("f2", 0.0, 10.0, "a"),
                  ("f2", 50.0, 58.0, "a"),
                  ("f1", 100.0, 110.0, "b"), ("f2", 50.0, 60.0, "b")]),
        0.9: _df([("f1", 0.0, 10.0, "a"), ("f2", 50.0, 60.0, "b")]),
    }

    # pin the raw per-class counts first (diagnosable hand numbers)
    meta = pd.DataFrame({"filename": ["f1", "f2"],
                         "duration": [3600.0, 3600.0]})
    ev = PSDSEvaluator(gt.drop(columns=["audio_id"]), meta, 0.5, 0.5, 0.3)
    ev.add_operating_point(preds[0.5])
    st_a = ev.operating_points[0]["per_class"]["a"]
    st_b = ev.operating_points[0]["per_class"]["b"]
    assert (st_a["tp"], st_a["fp"]) == (2, 1)
    np.testing.assert_allclose(st_a["fpr"], 0.5)
    np.testing.assert_allclose(st_a["ctr"], 180.0)  # 1 CT / 20 s b-GT
    assert (st_b["tp"], st_b["fp"]) == (2, 0)

    value = compute_psds(preds, gt, duration, dtc_threshold=0.5,
                         gtc_threshold=0.5, cttc_threshold=0.3,
                         alpha_ct=0.5, alpha_st=1.0, max_efpr=100.0)
    expected = (0.5 * 90.5 + 1.0 * 9.5) / 100.0
    np.testing.assert_allclose(value, expected, rtol=1e-9)

    # same scenario without penalties: a's eFPR is just 0.5/h,
    # mu = [0.75 on [0, 0.5), 1.0 after] -> 0.99875
    value0 = compute_psds(preds, gt, duration, dtc_threshold=0.5,
                          gtc_threshold=0.5, cttc_threshold=0.0,
                          alpha_ct=0.0, alpha_st=0.0, max_efpr=100.0)
    np.testing.assert_allclose(value0, (0.75 * 0.5 + 1.0 * 99.5) / 100.0,
                               rtol=1e-9)


# ------------------------------------------------ sed_scores (exact sweep)

def test_psds_sed_scores_single_class_hand():
    """1 file (1 h), frames [0,5) [5,10) [10,15) scored [0.8, 0.3, 0.9],
    GT [0,5], dtc=gtc=0.5.

    th in (0.8, 0.9]: det [10,15] -> FP -> (eFPR 1/h, TPR 0)
    th in (0.3, 0.8]: dets [0,5] TP + [10,15] FP -> (1, 1)
    th <= 0.3: one det [0,15]: DTC 5/15 < 0.5 -> FP, no TP -> (1, 0)
    ROC running-max: 0 at eFPR 0, 1 from eFPR 1 -> PSDS over [0,100]
    = 99/100.
    """
    from texttoaudiogrounding_tpu.evaluation import compute_psds_sed_scores

    scores = {"f1": pd.DataFrame({
        "onset": [0.0, 5.0, 10.0], "offset": [5.0, 10.0, 15.0],
        "fake_event": [0.8, 0.3, 0.9]})}
    ground_truth = {"f1": [(0.0, 5.0, "fake_event")]}
    duration = pd.DataFrame({"audio_id": ["a1"], "duration": [3600.0]})
    value = compute_psds_sed_scores(scores, ground_truth, duration,
                                    {"f1": "a1"}, dtc_threshold=0.5,
                                    gtc_threshold=0.5, max_efpr=100.0)
    np.testing.assert_allclose(value, 99.0 / 100.0, rtol=1e-9)


def test_psds_sed_scores_multiclass_cttc_hand():
    """1 file (1 h), classes a/b over frames [0,5) [5,10) [10,15);
    a scored [0.8, 0.3, 0.0] with GT a[0,5] + a[10,15]; b scored
    [0.4, 0.9, 0.0] with GT b[5,10].  dtc=gtc=0.7, cttc=0.3.

    dtc must be 0.7 here: the sweep's low endpoint binarizes the WHOLE
    file into one det [0,15] whose intersection with a's two GTs SUMS to
    10/15 = 0.667 (psds_eval sums det_precision over all same-class
    GTs), which would be DTC-valid at 0.6 and make both GTs TPs.

    class a: th in (0.3, 0.8]: det [0,5] TP (gt2 missed) -> (0, 0.5);
      th <= 0.3: dets [0,10] / [0,15]: DTC 0.5 / 0.667 < 0.7 -> FP +
      cross-trigger on b (inter/det 0.5 / 0.333 >= 0.3) -> eFPR =
      1 + alpha_ct*(1 CT / 5 s b-GT = 720/h) = 361; TPR 0.
      Running max: 0.5 everywhere on [0, 100].
    class b: th in (0.4, 0.9]: det [5,10] TP -> (0, 1); th <= 0.4:
      dets [0,10] / [0,15] DTC-fail -> FP + CT on a (0.5 / 0.667 >=
      0.3; a-GT duration 10 s -> ctr 360/h) -> (181, 0).  Running
      max: 1.0 everywhere.
    alpha_st=0: mu = 0.75 flat -> PSDS 0.75; alpha_st=1: sigma 0.25 ->
    0.5.
    """
    from texttoaudiogrounding_tpu.evaluation import compute_psds_sed_scores

    scores = {"f1": pd.DataFrame({
        "onset": [0.0, 5.0, 10.0], "offset": [5.0, 10.0, 15.0],
        "a": [0.8, 0.3, 0.0], "b": [0.4, 0.9, 0.0]})}
    ground_truth = {"f1": [(0.0, 5.0, "a"), (10.0, 15.0, "a"),
                           (5.0, 10.0, "b")]}
    duration = pd.DataFrame({"audio_id": ["a1"], "duration": [3600.0]})
    common = dict(dtc_threshold=0.7, gtc_threshold=0.7,
                  cttc_threshold=0.3, alpha_ct=0.5, max_efpr=100.0)
    v0 = compute_psds_sed_scores(scores, ground_truth, duration,
                                 {"f1": "a1"}, alpha_st=0.0, **common)
    np.testing.assert_allclose(v0, 0.75, rtol=1e-9)
    v1 = compute_psds_sed_scores(scores, ground_truth, duration,
                                 {"f1": "a1"}, alpha_st=1.0, **common)
    np.testing.assert_allclose(v1, 0.5, rtol=1e-9)


# ------------------------------------------------------------ sed_eval F1

def test_sed_eval_hand():
    """GT f1: a[1,3], a[5,6], b[7,8]; dets a[1.1,3.1], a[6.5,6.9],
    b[7.15,8.6].  t_collar 0.2, offset collar max(0.2, 0.2*len).

    Event: a[1,3] matches a[1.1,3.1] (onset 0.1 <= 0.2, offset 0.1 <=
    max(0.2, 0.4)); a[5,6] unmatched; b[7,8] vs [7.15,8.6]: offset 0.6 >
    0.2 -> unmatched.  Micro: tp1 fp2 fn2 -> P=R=1/3 -> F = 1/3.
    Macro: a F = 1/2, b F = 0 -> 0.25.

    Segment (1 s grid, 9 segments from max offset 8.6): active segs
    (g+1 > onset and g < offset): ref a {1,2,5}, sys a {1,2,3,6} ->
    tp2 fp2 fn1; ref b {7}, sys b {7,8} -> tp1 fp1 fn0.
    Micro: tp3 fp3 fn1 -> P=0.5, R=0.75 -> F = 0.6.
    Macro: a F = (2*(2/4)*(2/3))/((2/4)+(2/3)) = 4/7; b F = 2/3 ->
    (4/7 + 2/3)/2 = 13/21.
    """
    from texttoaudiogrounding_tpu.evaluation import compute_sed_eval

    gt = _df([("f1", 1.0, 3.0, "a"), ("f1", 5.0, 6.0, "a"),
              ("f1", 7.0, 8.0, "b")])
    det = _df([("f1", 1.1, 3.1, "a"), ("f1", 6.5, 6.9, "a"),
               ("f1", 7.15, 8.6, "b")])
    event, segment = compute_sed_eval(gt, det, t_collar=0.2,
                                      time_resolution=1.0)
    np.testing.assert_allclose(event["overall"]["f_measure"], 1.0 / 3.0,
                               rtol=1e-12)
    np.testing.assert_allclose(event["class_wise_average"]["f_measure"],
                               0.25, rtol=1e-12)
    np.testing.assert_allclose(segment["overall"]["f_measure"], 0.6,
                               rtol=1e-12)
    np.testing.assert_allclose(segment["class_wise_average"]["f_measure"],
                               13.0 / 21.0, rtol=1e-12)
