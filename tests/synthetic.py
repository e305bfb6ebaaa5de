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
