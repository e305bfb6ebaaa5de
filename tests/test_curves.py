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
