"""Host-side IO helpers: HDF5 waveform stores, TSV maps, audio decode.

Keeps the reference artifact formats (HDF5 + TSV index + label JSON,
reference datasets/single_phrase_dataset.py:13-17, utils/train_util.py:24-34)
so reference-prepared data drops in unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional

import h5py
import numpy as np
import pandas as pd


def as_wire(waveform) -> np.ndarray:
    """Keep float16-packed waveforms (tools/pack_waveform.py stores f16,
    mirroring reference utils/data/prepare_wav_csv.py's packed HDF5) in
    their storage dtype through collate and host→device transfer — this
    halves host memcpy and wire bytes; the jitted steps upcast on device
    (runner_base.upcast_wire), so values are bit-identical to a host-side
    upcast.  Anything else (raw wav float64, int PCM) normalizes to f32.

    The single wire-format policy for every dataset family (the dict
    datasets import it as ``_as_wire``; AudioReadMixin calls it too)."""
    arr = np.asarray(waveform)
    if arr.dtype == np.float16:
        return arr
    return arr.astype(np.float32, copy=False)


def load_dict_from_csv(csv: str, cols: tuple) -> dict:
    """Two-column TSV → dict (reference utils/train_util.py:24-27)."""
    df = pd.read_csv(csv, sep="\t")
    return dict(zip(df[cols[0]], df[cols[1]]))


def read_from_h5(key: str, hdf5_path: str,
                 cache: Optional[Dict] = None) -> np.ndarray:
    """Read one dataset from an HDF5 file, with optional open-handle cache
    (reference datasets/multi_phrase_dataset.py:20-28)."""
    if cache is None:
        with h5py.File(hdf5_path, "r") as hf:
            return hf[key][()]
    if hdf5_path not in cache:
        cache[hdf5_path] = h5py.File(hdf5_path, "r")
    return cache[hdf5_path][key][()]


def resample_poly(waveform: np.ndarray, orig_sr: int,
                  target_sr: int) -> np.ndarray:
    """Polyphase resampling (librosa/torchaudio-free)."""
    if orig_sr == target_sr:
        return waveform
    from math import gcd

    from scipy.signal import resample_poly as _rp
    g = gcd(orig_sr, target_sr)
    return _rp(waveform, target_sr // g, orig_sr // g).astype(
        waveform.dtype)


def load_wav(file_path: str, target_sr: int) -> np.ndarray:
    """Decode a WAV file to mono float32 at ``target_sr``.

    Replaces the reference's torchaudio.load + resample path
    (datasets/multi_phrase_dataset.py:43-47).  Only uncompressed WAV is
    supported in this environment (no libsndfile); packed HDF5 is the
    primary storage format anyway.
    """
    from scipy.io import wavfile
    orig_sr, data = wavfile.read(file_path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    return resample_poly(data, orig_sr, target_sr)


class AudioReadMixin:
    """Waveforms from HDF5 (by audio_id) or raw WAV files.

    Reference: datasets/multi_phrase_dataset.py:31-48.
    """

    def __init__(self, sample_rate: int, use_cache: bool = False):
        self.h5_cache: Optional[Dict] = {} if use_cache else None
        self.sample_rate = sample_rate

    def load_audio(self, audio_id: str, file_path: str) -> np.ndarray:
        if file_path.endswith((".hdf5", ".h5")):
            waveform = read_from_h5(audio_id, file_path, self.h5_cache)
        else:
            waveform = load_wav(file_path, self.sample_rate)
        return as_wire(waveform)
