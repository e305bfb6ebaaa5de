"""Zero-shot SED on DESED: run the grounding model once per class phrase.

Reference: python_scripts/evaluation/evaluate_on_desed.py:124-310 — the 10
DESED classes are mapped to hand-written phrases; the WSTAG model scores all
classes (as a single N=10 multi-text forward here, instead of the
reference's per-class loop) and the resulting [T, 10] score tracks are
evaluated with PSDS1 (dtc=gtc=0.7, alpha_st=1), PSDS2 (dtc=gtc=0.1,
cttc=0.3, alpha_ct=0.5, alpha_st=1) and an operating-point macro-F1 with
double-threshold (0.75/0.25) decoding.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.evaluation.decode import (
    binarize,
    decode_with_timestamps,
    double_threshold,
)
from texttoaudiogrounding_tpu.evaluation.psds import (
    PSDSEvaluator,
    compute_psds_sed_scores,
)

DESED_CLASSES = [
    "Speech", "Frying", "Dishes", "Running_water", "Blender",
    "Electric_shaver_toothbrush", "Alarm_bell_ringing", "Cat", "Dog",
    "Vacuum_cleaner",
]

# hand-written phrase prompt per class (reference evaluate_on_desed.py:
# 124-141 — behavioral data)
CLASS_TO_PHRASE = {
    "Speech": "speaking",
    "Frying": "frying",
    "Dishes": "dishes clanking",
    "Running_water": "water",
    "Blender": "machine running",
    "Electric_shaver_toothbrush": "electric shaver",
    "Alarm_bell_ringing": "ringing",
    "Cat": "cat meowing",
    "Dog": "dog barking",
    "Vacuum_cleaner": "vacuum cleaner running",
}

PSDS1_CFG = {"dtc_threshold": 0.7, "gtc_threshold": 0.7,
             "cttc_threshold": 0.0, "alpha_ct": 0.0, "alpha_st": 1.0}
PSDS2_CFG = {"dtc_threshold": 0.1, "gtc_threshold": 0.1,
             "cttc_threshold": 0.3, "alpha_ct": 0.5, "alpha_st": 1.0}


def score_clips_zero_shot(predictor, clips: dict,
                          time_resolution: float = 0.04,
                          classes: Optional[list] = None) -> dict:
    """``clips``: audio_id → waveform [N].  Returns audio_id → score
    DataFrame (onset/offset + one column per class).

    ``predictor`` is a GroundingPredictor over a multi-text or bi-encoder
    model; all class phrases are scored in one batched call per clip.
    """
    classes = classes or DESED_CLASSES
    phrases = [CLASS_TO_PHRASE.get(c, c.replace("_", " ").lower())
               for c in classes]
    score_buffer = {}
    for audio_id, waveform in clips.items():
        waveform = np.asarray(waveform, np.float32)
        audio = np.tile(waveform[None], (len(classes), 1))
        lens = np.full((len(classes),), waveform.shape[0])
        probs, out_lens = predictor.predict(audio, lens, phrases,
                                            return_length=True)  # [C, T]
        # the model's exact frame-count arithmetic — inferring it from
        # nonzero scores would break on match fns whose valid scores
        # can underflow to exactly 0.0
        n = max(int(out_lens[0]), 1)
        scores = np.clip(probs[:, :n].T, 0.0, 1.0)        # [T, C]
        timestamps = np.arange(n + 1) * time_resolution
        df = pd.DataFrame({"onset": timestamps[:-1],
                           "offset": timestamps[1:]})
        for i, cls in enumerate(classes):
            df[cls] = scores[:, i]
        score_buffer[audio_id] = df
    return score_buffer


def evaluate_desed_psds(score_buffer: dict, ground_truth: dict,
                        durations: dict,
                        num_thresholds: int = 50) -> dict:
    """PSDS1 + PSDS2 over zero-shot score tracks (reference
    evaluate_on_desed.py:198-214, max_efpr=100)."""
    dur_df = pd.DataFrame([{"audio_id": k, "duration": v}
                           for k, v in durations.items()])
    fname_to_aid = {k: k for k in score_buffer}
    results = {}
    for name, cfg in (("psds1", PSDS1_CFG), ("psds2", PSDS2_CFG)):
        results[name] = compute_psds_sed_scores(
            scores=score_buffer, ground_truth=ground_truth,
            duration=dur_df, fname_to_aid=fname_to_aid,
            max_efpr=100.0, num_thresholds=num_thresholds, **cfg)
    return results


def evaluate_desed_macro_f1(score_buffer: dict, ground_truth: dict,
                            durations: dict,
                            thresholds=(0.75, 0.25),
                            time_resolution: float = 0.04,
                            classes: Optional[list] = None) -> dict:
    """Operating-point macro F1 with double-threshold decoding
    (reference evaluate_on_desed.py:217-310; psds_eval
    ``compute_macro_f_score`` counts TPs under the DTC/GTC criteria)."""
    classes = classes or DESED_CLASSES
    pred_rows = []
    for audio_id, df in score_buffer.items():
        scores = df[classes].values[None]               # [1, T, C]
        if len(thresholds) == 2:
            binary = double_threshold(scores, *thresholds)
        else:
            binary = binarize(scores, threshold=thresholds[0])
        for event_label, onset, offset in decode_with_timestamps(
                classes, binary)[0]:
            pred_rows.append({"filename": audio_id,
                              "event_label": event_label,
                              "onset": onset * time_resolution,
                              "offset": offset * time_resolution})
    pred_df = pd.DataFrame(pred_rows, columns=["filename", "event_label",
                                               "onset", "offset"])
    gt_rows = [{"filename": fname, "onset": on, "offset": off,
                "event_label": label}
               for fname, events in ground_truth.items()
               for on, off, label in events]
    gt_df = pd.DataFrame(gt_rows)
    meta = pd.DataFrame([{"filename": k, "duration": v}
                         for k, v in durations.items()])
    evaluator = PSDSEvaluator(gt_df, meta, 0.5, 0.5)
    evaluator.add_operating_point(pred_df)
    per_class = {}
    for cls in evaluator.class_names:
        st = evaluator.operating_points[0]["per_class"][cls]
        num_gts = int((evaluator.ground_truth.event_label == cls).sum())
        # psds_eval compute_macro_f_score counting: TP = ground truths
        # matched (GTC), FP = detections failing the DTC, FN = misses;
        # F = 2TP / (2TP + FN + FP).  (Dividing the GT-counted TP by the
        # detection count would allow precision — and F — above 1 when
        # one detection covers several ground truths.)
        tp = st["tp"]
        fp = st["fp"]
        fn = num_gts - tp
        per_class[cls] = 2.0 * tp / max(2.0 * tp + fn + fp, 1e-15)
    macro = float(np.mean(list(per_class.values()))) if per_class else 0.0
    return {"macro_f1": macro, "class_f1": per_class,
            "predictions": pred_df}


def run_desed_evaluation(experiment_path: str, wav_csv: str, gt_tsv: str,
                         duration_tsv: str,
                         time_resolution: float = 0.04) -> dict:
    """End-to-end driver: experiment dir + DESED eval metadata → metrics."""
    from texttoaudiogrounding_tpu.data.h5io import read_from_h5
    from texttoaudiogrounding_tpu.inference import GroundingPredictor

    predictor = GroundingPredictor.from_experiment(experiment_path)
    wav_df = pd.read_csv(wav_csv, sep="\t")
    gt_df = pd.read_csv(gt_tsv, sep="\t")
    dur_df = pd.read_csv(duration_tsv, sep="\t")
    durations = dict(zip(dur_df["filename"]
                         if "filename" in dur_df else dur_df["audio_id"],
                         dur_df["duration"]))
    clips = {}
    cache: dict = {}
    path_col = "hdf5_path" if "hdf5_path" in wav_df else "file_name"
    for _, row in wav_df.iterrows():
        clips[row["audio_id"]] = read_from_h5(row["audio_id"],
                                              row[path_col], cache)
    ground_truth: dict = {aid: [] for aid in clips}
    for _, row in gt_df.iterrows():
        if row["event_label"] in DESED_CLASSES and \
                row["filename"] in ground_truth:
            ground_truth[row["filename"]].append(
                (row["onset"], row["offset"], row["event_label"]))

    score_buffer = score_clips_zero_shot(predictor, clips,
                                         time_resolution)
    results = evaluate_desed_psds(score_buffer, ground_truth, durations)
    results.update(evaluate_desed_macro_f1(score_buffer, ground_truth,
                                           durations,
                                           time_resolution=time_resolution))
    print(f"psds1: {results['psds1']:.4f}, psds2: {results['psds2']:.4f}, "
          f"macro_f1: {results['macro_f1']:.4f}")
    return results
