"""Collar / intersection F-score-vs-threshold curves."""

import numpy as np
import pandas as pd
import pytest

from texttoaudiogrounding_tpu.evaluation.curves import (
    _events_at_threshold,
    collar_fscore_curve,
    intersection_fscore_curve,
)


def _score_df(track, res=0.1):
    t = np.arange(len(track) + 1) * res
    return pd.DataFrame({"onset": t[:-1], "offset": t[1:],
                         "fake_event": track})


def test_events_at_threshold():
    df = _score_df(np.array([0.1, 0.9, 0.9, 0.1, 0.8]))
    ev = _events_at_threshold(df, "fake_event", 0.5)
    np.testing.assert_allclose(ev, [[0.1, 0.3], [0.4, 0.5]])
    assert _events_at_threshold(df, "fake_event", 0.95).shape == (0, 2)


def test_collar_curve_oracle_vs_random(rng):
    scores, gt = {}, {}
    for i in range(6):
        fname = f"f{i}"
        track = np.full(100, 0.05)
        track[20:60] = 0.9
        scores[fname] = _score_df(track)
        gt[fname] = [(2.0, 6.0, "fake_event")]
    result = collar_fscore_curve(scores, gt, num_thresholds=20)
    assert result["f_curve"].max() == pytest.approx(1.0)
    assert result["auc"] > 0.5

    rand_scores = {f: _score_df(rng.uniform(size=100)) for f in scores}
    rand = collar_fscore_curve(rand_scores, gt, num_thresholds=20)
    assert result["auc"] > rand["auc"]


def test_collar_curve_hand_golden():
    """Hand-derived collar-curve value (VERDICT r4 item 7; the pattern
    of test_metric_hand_goldens.py — every count spelled out).

    num_thresholds=4 -> thresholds linspace(0,1,5)[1:-1] = [.25,.5,.75].

    f0 track [0.3, 0.8, 0.8, 0.3] @ 0.1 s, gt (0.1, 0.3):
      th .25: frames>.25 = all 4  -> sys (0.0, 0.4).  onset |0.1-0.0|=.1
              <= .2, offset |0.3-0.4|=.1 <= max(.2, .2*.2)=.2 -> TP
      th .50: frames 1-2 (0.8)    -> sys (0.1, 0.3) exact -> TP
      th .75: frames 1-2 (0.8>.75)-> sys (0.1, 0.3) exact -> TP
    f1 track [0.6, 0.6, 0.05, 0.05], gt (1.0, 2.0):
      th .25/.50: sys (0.0, 0.2); onset |1.0-0.0|=1.0 > .2 -> FP + FN
      th .75: no sys events -> FN
    Micro counts -> F:
      th .25: tp=1 fp=1 fn=1 -> P=R=1/2 -> F=1/2
      th .50: same -> F=1/2
      th .75: tp=1 fp=0 fn=1 -> P=1, R=1/2 -> F=2/3
    Staircase AUC to max_x=.75: widths (.25, .25, 0) ->
      .5*.25 + .5*.25 + (2/3)*0 = 0.25.
    """
    scores = {
        "f0": _score_df(np.array([0.3, 0.8, 0.8, 0.3])),
        "f1": _score_df(np.array([0.6, 0.6, 0.05, 0.05])),
    }
    gt = {"f0": [(0.1, 0.3, "fake_event")],
          "f1": [(1.0, 2.0, "fake_event")]}
    result = collar_fscore_curve(scores, gt, num_thresholds=4)
    np.testing.assert_allclose(result["thresholds"], [0.25, 0.5, 0.75])
    np.testing.assert_allclose(result["f_curve"], [0.5, 0.5, 2 / 3],
                               atol=1e-12)
    assert result["auc"] == pytest.approx(0.25, abs=1e-12)


def test_intersection_curve():
    scores, gt = {}, {}
    for i in range(4):
        fname = f"f{i}"
        track = np.full(100, 0.05)
        track[20:60] = 0.9
        scores[fname] = _score_df(track)
        gt[fname] = [(2.0, 6.0, "fake_event")]
    result = intersection_fscore_curve(scores, gt, num_thresholds=20)
    assert result["f_max"] == pytest.approx(1.0)
    assert result["score"] > 0.5
