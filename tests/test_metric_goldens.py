"""Metric engine vs REAL-library golden fixtures.

``tests/fixtures/metric_goldens.json`` is produced by
``scripts/gen_metric_goldens.py`` run in an environment where
psds_eval / sed_scores_eval / sed_eval ARE installed (they are absent
from this container's image).  Once committed, these tests pin this
repo's self-implemented metric engine to the reference stack's actual
outputs — closing the "validated only against itself" gap.  Until then
they skip with a pointer to the generator.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from tests.synthetic import make_metric_golden_scenario

GOLDEN_PATH = Path(__file__).parent / "fixtures" / "metric_goldens.json"

pytestmark = pytest.mark.skipif(
    not GOLDEN_PATH.exists(),
    reason="no metric goldens committed yet — generate with "
           "scripts/gen_metric_goldens.py where psds_eval/sed_scores_eval/"
           "sed_eval are installed, then commit the fixture")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def scenario():
    return make_metric_golden_scenario()


def test_psds_operating_points_vs_golden(goldens, scenario):
    from texttoaudiogrounding_tpu.evaluation import compute_psds

    for dtc, gtc in ((0.5, 0.5), (0.1, 0.1)):
        key = f"psds_op_dtc{dtc}_gtc{gtc}"
        if key not in goldens:
            pytest.skip(f"{key} not in fixture")
        value = compute_psds(scenario["prediction_dfs"],
                             scenario["gt_df_aid"],
                             scenario["duration_df"],
                             dtc_threshold=dtc, gtc_threshold=gtc,
                             cttc_threshold=0.3)
        np.testing.assert_allclose(value, goldens[key], rtol=1e-3)


def test_psds_operating_points_psds2_vs_golden(goldens, scenario):
    from texttoaudiogrounding_tpu.evaluation import compute_psds

    if "psds_op_psds2" not in goldens:
        pytest.skip("psds_op_psds2 not in fixture")
    value = compute_psds(scenario["prediction_dfs"], scenario["gt_df_aid"],
                         scenario["duration_df"],
                         dtc_threshold=0.1, gtc_threshold=0.1,
                         cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1.0,
                         max_efpr=None)
    np.testing.assert_allclose(value, goldens["psds_op_psds2"], rtol=1e-3)


@pytest.mark.parametrize("key,kwargs", [
    ("psds_sed_scores_maxefpr_none",
     dict(dtc_threshold=0.5, gtc_threshold=0.5, max_efpr=None)),
    ("psds_sed_scores_maxefpr_100",
     dict(dtc_threshold=0.5, gtc_threshold=0.5, max_efpr=100.0)),
    ("psds_sed_scores_psds2",
     dict(dtc_threshold=0.1, gtc_threshold=0.1, cttc_threshold=0.3,
          alpha_ct=0.5, alpha_st=1.0, max_efpr=100.0)),
])
def test_psds_sed_scores_vs_golden(goldens, scenario, key, kwargs):
    from texttoaudiogrounding_tpu.evaluation import compute_psds_sed_scores

    if key not in goldens:
        pytest.skip(f"{key} not in fixture")
    value = compute_psds_sed_scores(scenario["scores"],
                                    scenario["ground_truth"],
                                    scenario["duration_df"],
                                    scenario["fname_to_aid"], **kwargs)
    np.testing.assert_allclose(value, goldens[key], rtol=1e-3)


def test_sed_eval_f1_vs_golden(goldens, scenario):
    from texttoaudiogrounding_tpu.evaluation import compute_sed_eval

    if "sed_eval_event_micro_f1" not in goldens:
        pytest.skip("sed_eval goldens not in fixture")
    event, segment = compute_sed_eval(
        scenario["gt_df"], scenario["prediction_dfs"][0.5],
        t_collar=0.2, time_resolution=1.0)
    np.testing.assert_allclose(event["overall"]["f_measure"],
                               goldens["sed_eval_event_micro_f1"],
                               rtol=1e-6)
    np.testing.assert_allclose(event["class_wise_average"]["f_measure"],
                               goldens["sed_eval_event_macro_f1"],
                               rtol=1e-6)
    np.testing.assert_allclose(segment["overall"]["f_measure"],
                               goldens["sed_eval_segment_micro_f1"],
                               rtol=1e-6)
    np.testing.assert_allclose(segment["class_wise_average"]["f_measure"],
                               goldens["sed_eval_segment_macro_f1"],
                               rtol=1e-6)
