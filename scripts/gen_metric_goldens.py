"""Generate metric golden fixtures with the REAL metric libraries.

Run this script in any environment where ``psds_eval`` /
``sed_scores_eval`` / ``sed_eval`` are installed (they are NOT in this
container's image — that is the point: the goldens pin this repo's
self-implemented metric engine to the reference stack's actual outputs,
not to its own twin implementation).  It writes
``tests/fixtures/metric_goldens.json``; commit that file and
``tests/test_metric_goldens.py`` stops skipping and starts enforcing.

The scenario is built by ``tests.synthetic.make_metric_golden_scenario``
(seeded, plain NumPy/pandas) so the generator and the test see
byte-identical inputs.  Library call patterns mirror the reference's
utils/eval_util.py:136-292 (PSDSEval add_operating_point loop,
intersection_based.psd_roc with staircase_auc normalization) and
utils/eval_util.py:340-414 (sed_eval Event/SegmentBasedMetrics loops).

Usage:  python scripts/gen_metric_goldens.py [output.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.synthetic import make_metric_golden_scenario  # noqa: E402


def psds_eval_goldens(sc) -> dict:
    from psds_eval import PSDSEval

    out = {}
    for dtc, gtc in ((0.5, 0.5), (0.1, 0.1)):
        ev = PSDSEval(ground_truth=sc["gt_df"], metadata=sc["metadata_df"],
                      dtc_threshold=dtc, gtc_threshold=gtc,
                      cttc_threshold=0.3)
        for i, k in enumerate(sorted(sc["prediction_dfs"])):
            ev.add_operating_point(
                sc["prediction_dfs"][k],
                info={"name": f"Op {i + 1:02d}", "threshold": k})
        out[f"psds_op_dtc{dtc}_gtc{gtc}"] = float(
            ev.psds(alpha_ct=0.0, alpha_st=0.0, max_efpr=None).value)
    # PSDS2-style penalties through the op-point evaluator
    ev = PSDSEval(ground_truth=sc["gt_df"], metadata=sc["metadata_df"],
                  dtc_threshold=0.1, gtc_threshold=0.1, cttc_threshold=0.3)
    for i, k in enumerate(sorted(sc["prediction_dfs"])):
        ev.add_operating_point(
            sc["prediction_dfs"][k],
            info={"name": f"Op {i + 1:02d}", "threshold": k})
    out["psds_op_psds2"] = float(
        ev.psds(alpha_ct=0.5, alpha_st=1.0, max_efpr=None).value)
    return out


def sed_scores_eval_goldens(sc) -> dict:
    from sed_scores_eval import intersection_based
    from sed_scores_eval.utils.auc import staircase_auc

    def psds(dtc, gtc, cttc, alpha_ct, alpha_st, max_efpr):
        etpr, efpr, _ = intersection_based.psd_roc(
            scores=sc["scores"], ground_truth=sc["ground_truth"],
            audio_durations={f: 10.0 for f in sc["scores"]},
            dtc_threshold=dtc, gtc_threshold=gtc, cttc_threshold=cttc,
            alpha_ct=alpha_ct, alpha_st=alpha_st, unit_of_time="hour",
            max_efpr=max_efpr, time_decimals=6, num_jobs=1)
        auc = staircase_auc(etpr, efpr, max_x=max_efpr)
        return float(auc / (max_efpr if max_efpr is not None
                            else max(efpr)))

    return {
        "psds_sed_scores_maxefpr_none": psds(0.5, 0.5, None, 0.0, 0.0,
                                             None),
        "psds_sed_scores_maxefpr_100": psds(0.5, 0.5, None, 0.0, 0.0,
                                            100.0),
        "psds_sed_scores_psds2": psds(0.1, 0.1, 0.3, 0.5, 1.0, 100.0),
    }


def sed_eval_goldens(sc) -> dict:
    import sed_eval

    reference = sc["gt_df"]
    estimated = sc["prediction_dfs"][0.5]
    classes = sorted(set(reference["event_label"])
                     | set(estimated["event_label"]))

    def rows(df, fname):
        sub = df[df["filename"] == fname]
        return [{"event_label": r["event_label"], "event_onset": r["onset"],
                 "event_offset": r["offset"], "file": fname}
                for _, r in sub.iterrows()]

    event = sed_eval.sound_event.EventBasedMetrics(
        event_label_list=classes, t_collar=0.2,
        percentage_of_length=0.5,
        empty_system_output_handling="zero_score")
    segment = sed_eval.sound_event.SegmentBasedMetrics(
        event_label_list=classes, time_resolution=1.0)
    for fname in sorted(reference["filename"].unique()):
        event.evaluate(reference_event_list=rows(reference, fname),
                       estimated_event_list=rows(estimated, fname))
        segment.evaluate(reference_event_list=rows(reference, fname),
                         estimated_event_list=rows(estimated, fname))
    ev, seg = event.results(), segment.results()
    return {
        "sed_eval_event_micro_f1":
            float(ev["overall"]["f_measure"]["f_measure"]),
        "sed_eval_event_macro_f1":
            float(ev["class_wise_average"]["f_measure"]["f_measure"]),
        "sed_eval_segment_micro_f1":
            float(seg["overall"]["f_measure"]["f_measure"]),
        "sed_eval_segment_macro_f1":
            float(seg["class_wise_average"]["f_measure"]["f_measure"]),
    }


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out_path = Path(argv[0]) if argv else (
        Path(__file__).resolve().parent.parent / "tests" / "fixtures" /
        "metric_goldens.json")
    sc = make_metric_golden_scenario()
    goldens: dict = {"provenance": {}}
    for name, fn in (("psds_eval", psds_eval_goldens),
                     ("sed_scores_eval", sed_scores_eval_goldens),
                     ("sed_eval", sed_eval_goldens)):
        try:
            module = __import__(name)
            goldens.update(fn(sc))
            goldens["provenance"][name] = getattr(module, "__version__",
                                                  "unknown")
        except ImportError as exc:
            print(f"skipping {name}: {exc}")
    if not goldens["provenance"]:
        raise SystemExit("no metric library available — nothing generated")
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(goldens, f, indent=2, sort_keys=True)
    print(f"wrote {out_path}: {sorted(k for k in goldens if k != 'provenance')}")


if __name__ == "__main__":
    main()
