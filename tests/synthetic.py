"""Synthetic AudioGrounding-format fixtures for tests and benchmarks.

Generates waveform HDF5 + TSV index + label JSON in the reference's artifact
formats (reference README.md:51-59), with planted sinusoid "events" so that
a trained model has real signal to find.
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

EVENT_WORDS = ["dog barking", "a man speaking", "bird chirping",
               "engine running", "water splashing", "door slamming",
               "cat meowing", "music playing"]
EVENT_FREQS = [400.0, 800.0, 1600.0, 3000.0, 240.0, 5000.0, 1200.0, 2200.0]


def make_grounding_data(root: Path, num_audio: int = 8,
                        duration: float = 2.0, sample_rate: int = 32000,
                        max_phrases: int = 2, seed: int = 0,
                        phrases_as_str: bool = False,
                        event_len: tuple = (0.3, 1.2)):
    """Write waveform.h5, waveform.csv, label.json under ``root``.

    Each audio contains 1..max_phrases events; each event is a sinusoid
    burst at a phrase-specific frequency over its labeled segments.
    ``event_len`` bounds the segment duration — short events (relative to
    the clip) make random scores a weak baseline, which floor tests need.
    Returns (waveform_csv, label_json, duration_csv) paths.
    """
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = int(duration * sample_rate)
    h5_path = root / "waveform.h5"
    label = []
    durations = []
    with h5py.File(h5_path, "w") as hf:
        for i in range(num_audio):
            audio_id = f"Yaudio{i:04d}"
            wav = rng.normal(size=n).astype(np.float32) * 0.01
            phrases = []
            num_p = int(rng.integers(1, max_phrases + 1))
            picks = rng.choice(len(EVENT_WORDS), size=num_p, replace=False)
            tokens = []
            for k, pick in enumerate(picks):
                word = EVENT_WORDS[pick]
                freq = EVENT_FREQS[pick]
                seg_on = float(rng.uniform(0.1, duration - event_len[0]
                                           - 0.05))
                seg_off = float(rng.uniform(seg_on + event_len[0],
                                            min(seg_on + event_len[1],
                                                duration)))
                t = np.arange(int((seg_off - seg_on) * sample_rate))
                burst = 0.3 * np.sin(2 * np.pi * freq * t / sample_rate)
                on_i = int(seg_on * sample_rate)
                wav[on_i:on_i + len(burst)] += burst.astype(np.float32)
                start_index = len(tokens)
                tokens.extend(word.split())
                phrases.append({
                    "phrase": word,
                    "start_index": start_index,
                    "end_index": len(tokens) - 1,
                    "segments": [[round(seg_on, 3), round(seg_off, 3)]],
                })
            # f16 like the production packer (tools/pack_waveform.py) so
            # runner tests exercise the f16 wire path end-to-end
            hf[audio_id] = wav.astype(np.float16)
            label.append({
                "audiocap_id": 10000 + i,
                "audio_id": audio_id,
                "tokens": " ".join(tokens),
                "phrases": ([p["phrase"] for p in phrases]
                            if phrases_as_str else phrases),
            })
            durations.append((audio_id, duration))

    wav_csv = root / "waveform.csv"
    with open(wav_csv, "w") as f:
        f.write("audio_id\thdf5_path\n")
        for item in label:
            f.write(f"{item['audio_id']}\t{h5_path}\n")
    # WSTAG datasets expect a `file_path` column
    wav_csv_fp = root / "waveform_fp.csv"
    with open(wav_csv_fp, "w") as f:
        f.write("audio_id\tfile_path\n")
        for item in label:
            f.write(f"{item['audio_id']}\t{h5_path}\n")

    label_json = root / "label.json"
    with open(label_json, "w") as f:
        json.dump(label, f)

    dur_csv = root / "duration.csv"
    with open(dur_csv, "w") as f:
        f.write("audio_id\tduration\n")
        for aid, dur in durations:
            f.write(f"{aid}\t{dur}\n")
    return wav_csv, label_json, dur_csv


def make_vocab(label_json: Path, out: Path):
    from texttoaudiogrounding_tpu.data.vocabulary import build_vocab
    with open(label_json) as f:
        items = json.load(f)
    return build_vocab(items, out)


def make_metric_golden_scenario():
    """Deterministic multi-class SED scenario shared by
    ``scripts/gen_metric_goldens.py`` (which computes golden metric values
    with the REAL psds_eval / sed_scores_eval / sed_eval libraries wherever
    they are installed) and ``tests/test_metric_goldens.py`` (which pins
    this repo's metric engine against the committed goldens).

    Everything here is plain NumPy/pandas — no dependency on either metric
    stack — so both sides see byte-identical inputs.  Returns a dict with:

    - ``scores``: {fname: DataFrame(onset, offset, <class>...)} per-frame
      score curves (sed_scores_eval format)
    - ``ground_truth``: {fname: [(onset, offset, label), ...]}
    - ``gt_df`` / ``gt_df_aid``: tidy event table without/with ``audio_id``
    - ``metadata_df``: (filename, duration) — psds_eval metadata
    - ``duration_df``: (audio_id, duration) — this repo's wrapper format
    - ``fname_to_aid``: identity map
    - ``prediction_dfs``: {threshold: DataFrame(filename, onset, offset,
      event_label)} — >=-threshold binarization + contiguous regions,
      computed inline (no decode dependency)
    """
    import pandas as pd

    rng = np.random.default_rng(1234)
    classes = ["dog", "water", "speech"]
    n_files, n_frames, res = 8, 125, 0.08  # 10 s at 0.08 s
    onsets = np.arange(n_frames) * res
    offsets = onsets + res

    scores, ground_truth, gt_rows = {}, {}, []
    for i in range(n_files):
        fname = f"clip_{i:02d}"
        events = []
        frame_scores = {}
        for cls in classes:
            truth = np.zeros(n_frames)
            for _ in range(int(rng.integers(0, 3))):
                start = int(rng.integers(0, n_frames - 12))
                length = int(rng.integers(6, 30))
                end = min(start + length, n_frames)
                truth[start:end] = 1.0
            # merge overlaps into event rows
            edges = np.flatnonzero(np.diff(np.r_[0, truth, 0]))
            for on, off in zip(edges[::2], edges[1::2]):
                events.append((float(on * res), float(off * res), cls))
                gt_rows.append({"filename": fname, "onset": on * res,
                                "offset": off * res, "event_label": cls})
            # realistically IMPERFECT score curves: per-event amplitude
            # and onset jitter (partial DTC/GTC overlaps), plus
            # false-positive bumps — so every metric is strictly inside
            # (0, 1) and the goldens have discriminating power
            score_truth = np.zeros(n_frames)
            for on, off in zip(edges[::2], edges[1::2]):
                amp = float(rng.uniform(0.35, 0.95))
                shift = int(rng.integers(-5, 6))
                lo = max(0, on + shift)
                hi = min(n_frames, off + shift)
                score_truth[lo:hi] = np.maximum(score_truth[lo:hi], amp)
            for _ in range(int(rng.integers(1, 4))):  # FP bumps
                start = int(rng.integers(0, n_frames - 8))
                length = int(rng.integers(3, 15))
                amp = float(rng.uniform(0.3, 0.9))
                score_truth[start:start + length] = np.maximum(
                    score_truth[start:start + length], amp)
            noisy = score_truth + 0.25 * rng.random(n_frames)
            frame_scores[cls] = np.clip(np.convolve(
                noisy, np.ones(3) / 3, mode="same"), 0, 1).round(4)
        scores[fname] = pd.DataFrame(
            {"onset": onsets, "offset": offsets, **frame_scores})
        ground_truth[fname] = events

    gt_df = pd.DataFrame(gt_rows)
    gt_df_aid = gt_df.assign(audio_id=gt_df["filename"])
    fnames = sorted(scores)
    metadata_df = pd.DataFrame(
        {"filename": fnames, "duration": [n_frames * res] * n_files})
    duration_df = pd.DataFrame(
        {"audio_id": fnames, "duration": [n_frames * res] * n_files})

    prediction_dfs = {}
    # dense grid + very high thresholds so some operating points survive
    # the PSDS2 cross-trigger eFPR penalty under max_efpr=100
    thresholds = np.r_[np.arange(0.05, 1.0, 0.05), 0.92, 0.98]
    for th in np.round(thresholds, 2):
        rows = []
        for fname in fnames:
            df = scores[fname]
            for cls in classes:
                mask = (df[cls].to_numpy() >= th).astype(int)
                edges = np.flatnonzero(np.diff(np.r_[0, mask, 0]))
                for on, off in zip(edges[::2], edges[1::2]):
                    rows.append({"filename": fname, "onset": on * res,
                                 "offset": off * res, "event_label": cls})
        prediction_dfs[float(th)] = pd.DataFrame(
            rows, columns=["filename", "onset", "offset", "event_label"])

    return {"scores": scores, "ground_truth": ground_truth,
            "gt_df": gt_df, "gt_df_aid": gt_df_aid,
            "metadata_df": metadata_df, "duration_df": duration_df,
            "fname_to_aid": {f: f for f in fnames},
            "prediction_dfs": prediction_dfs, "classes": classes}
