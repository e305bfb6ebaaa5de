"""Datasets for TAG / WSTAG training and evaluation.

Host-side NumPy datasets over the reference's artifact formats:

* grounding label JSON: ``[{audiocap_id, audio_id, tokens, phrases:
  [{phrase, start_index, end_index, segments: [[on, off], ...]}]}]``
  (reference README.md:51-59, datasets/single_phrase_dataset.py:20-90);
* WSTAG caption JSON: same but ``phrases`` is a list of strings
  (datasets/multi_phrase_dataset.py:51-307);
* waveform TSV: ``audio_id<TAB>hdf5_path`` (or ``file_path``).

Randomness is a per-dataset ``numpy.random.Generator`` with an explicit
seed (+ optional ``reseed(epoch)``) so negative sampling is reproducible
under per-host data sharding.
"""

from __future__ import annotations

import json
import math
import pickle
from typing import Optional

import h5py
import numpy as np

from texttoaudiogrounding_tpu.data.h5io import (
    AudioReadMixin,
    as_wire,
    load_dict_from_csv,
    read_from_h5,
)
from texttoaudiogrounding_tpu.utils.registry import register


class Dataset:
    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError

    def reseed(self, salt: int) -> None:
        """Re-derive ``self.rng`` deterministically from the construction
        seed + ``salt`` (per-epoch in thread loaders, per-task in process
        workers — data/loader.py).  Without this, forkserver workers
        unpickle identical rng states and draw correlated crops/negatives.
        No-op for datasets without an rng."""
        if hasattr(self, "rng"):
            self.rng = np.random.default_rng(
                getattr(self, "_seed", 0) + salt)

    def __getstate__(self):
        # open h5py handles don't pickle; process-worker loaders re-open
        # lazily in the child (read_from_h5 repopulates the cache)
        state = dict(self.__dict__)
        for key in ("cache", "h5_cache"):
            if isinstance(state.get(key), dict):
                state[key] = {}
        return state


# the single wire-format policy lives in h5io (AudioReadMixin shares it)
_as_wire = as_wire


def _load_label(label) -> list:
    if isinstance(label, list) and label and isinstance(label[0], str):
        data = []
        for item in label:
            with open(item) as f:
                data.extend(json.load(f))
        return data
    if isinstance(label, str):
        with open(label) as f:
            return json.load(f)
    return label


@register("AudioPhraseEvalDataset")
class AudioPhraseEvalDataset(Dataset):
    """(audio, phrase) pairs for strong evaluation.

    Reference: datasets/single_phrase_dataset.py:20-60.
    """

    def __init__(self, waveform: str, label: str, sample_rate: int = 32000):
        self.aid_to_h5 = load_dict_from_csv(waveform,
                                            ("audio_id", "hdf5_path"))
        self.cache: dict = {}
        self.data = _load_label(label)
        self.sample_rate = sample_rate
        self.generate_index()

    def generate_index(self):
        self.idxs = [(ai, pi)
                     for ai, audio_item in enumerate(self.data)
                     for pi, _ in enumerate(audio_item["phrases"])]

    def __getitem__(self, index):
        audio_idx, phrase_idx = self.idxs[index]
        audio_item = self.data[audio_idx]
        phrase_item = audio_item["phrases"][phrase_idx]
        waveform = read_from_h5(audio_item["audio_id"],
                                self.aid_to_h5[audio_item["audio_id"]],
                                self.cache)
        return {
            "audio_id": audio_item["audio_id"],
            "audiocap_id": audio_item["audiocap_id"],
            "start_index": phrase_item["start_index"],
            "end_index": phrase_item["end_index"],
            "waveform": _as_wire(waveform),
            "phrase": phrase_item["phrase"],
            "caption": audio_item["tokens"],
        }

    def __len__(self):
        return len(self.idxs)


@register("AudioPhraseDataset")
class AudioPhraseDataset(AudioPhraseEvalDataset):
    """Adds rasterized 0/1 frame labels at ``time_resolution``.

    Reference: datasets/single_phrase_dataset.py:63-88 (label math :79-86).
    """

    def __init__(self, waveform: str, label: str,
                 time_resolution: float = 0.02, sample_rate: int = 32000):
        super().__init__(waveform, label, sample_rate)
        self.time_resolution = time_resolution

    def __getitem__(self, index):
        output = super().__getitem__(index)
        audio_idx, phrase_idx = self.idxs[index]
        phrase_item = self.data[audio_idx]["phrases"][phrase_idx]
        duration = output["waveform"].shape[0] / self.sample_rate
        n_frame = math.floor(duration / self.time_resolution) + 1
        frame_label = np.zeros(n_frame, dtype=np.float32)
        for start, end in phrase_item["segments"]:
            onset = round(start / self.time_resolution)
            offset = round(end / self.time_resolution)
            frame_label[onset:offset] = 1
        output["label"] = frame_label
        return output


@register("AudioSamplePhrasesDataset")
class AudioSamplePhrasesDataset(AudioReadMixin, Dataset):
    """WSTAG phrase-sampling dataset: positives from the caption + sampled
    negatives to reach ``phrase_num``.

    Negative-sampling strategies (reference
    datasets/multi_phrase_dataset.py:177-278):

    * ``random`` — uniform over the non-positive phrase pool;
    * ``similarity`` — shuffled pointer-chunk scan keeping candidates whose
      max cosine similarity to any positive is below ``sim_threshold``;
    * ``clustering`` — sample phrases from non-positive k-means clusters,
      multi-pass allocation when clusters < needed.
    """

    def __init__(self, audio: str, label, phrase_num: int, fix_neg: bool,
                 neg_samp_stratg: str = "clustering",
                 max_phrase_length: Optional[int] = None,
                 sample_rate: int = 32000,
                 max_audio_length: Optional[float] = None,
                 seed: int = 0, **kwargs):
        AudioReadMixin.__init__(self, sample_rate)
        self.aid_to_fpath = load_dict_from_csv(audio,
                                               ("audio_id", "file_path"))
        self.max_audio_len = (int(max_audio_length * sample_rate)
                              if max_audio_length is not None else None)
        self.max_phrase_len = max_phrase_length
        self.data = _load_label(label)
        self.phrase_num = phrase_num
        self.rng = np.random.default_rng(seed)
        self._seed = seed
        if neg_samp_stratg not in ("random", "clustering", "similarity"):
            raise ValueError(f"bad neg_samp_stratg {neg_samp_stratg}")

        phrases = []
        fil_data = []
        for audio_item in self.data:
            kept = False
            for phrase in audio_item["phrases"]:
                if (self.max_phrase_len is not None
                        and len(phrase.split()) > self.max_phrase_len):
                    continue
                phrases.append(phrase)
                kept = True
            if kept:
                fil_data.append(audio_item)
        self.data = fil_data
        self.phrases = np.array(sorted(set(phrases)))
        self.phrase_to_idx = {p: i for i, p in enumerate(self.phrases)}

        self.fix_neg = fix_neg
        self.aid_to_neg: dict = {}

        self.neg_samp_stratg = neg_samp_stratg
        if neg_samp_stratg == "clustering":
            if "cluster_map" not in kwargs:
                raise ValueError("cluster_map not provided")
            (self.cluster_idx_to_phrases,
             self.phrase_to_cluster_idx) = self.read_cluster_map(
                kwargs["cluster_map"])
            self.cluster_idxs = np.array(
                list(self.cluster_idx_to_phrases.keys()))
            self.cluster_idx_to_idx = {c: i
                                       for i, c in enumerate(
                                           self.cluster_idxs)}
        elif neg_samp_stratg == "similarity":
            if "phrase_embed" not in kwargs or "sim_threshold" not in kwargs:
                raise ValueError("phrase_embed / sim_threshold not provided")
            self.sim_threshold = kwargs["sim_threshold"]
            phrase_embed = kwargs["phrase_embed"]
            if phrase_embed.endswith(".pkl"):
                with open(phrase_embed, "rb") as f:
                    self.phrase_to_emb = pickle.load(f)
            elif phrase_embed.endswith((".hdf5", ".h5")):
                self.phrase_to_emb = {}
                with h5py.File(phrase_embed, "r") as hf:
                    for phrase in self.phrases:
                        self.phrase_to_emb[phrase] = hf[
                            phrase.replace("/", "%2F")][()]
            if "negative_pool" in kwargs:
                pool = []
                with open(kwargs["negative_pool"]) as reader:
                    for line in reader:
                        phrase = line.strip()
                        if (self.max_phrase_len is not None and
                                len(phrase.split()) > self.max_phrase_len):
                            continue
                        pool.append(phrase)
                self.phrases = np.array(pool)
                self.phrase_to_idx = {p: i
                                      for i, p in enumerate(self.phrases)}
            for phrase in (set(self.phrase_to_emb)
                           - set(self.phrases.tolist())):
                del self.phrase_to_emb[phrase]
            embs = [self.phrase_to_emb[p] for p in self.phrases]
            self.phrase_embs = np.stack(embs)
            norms = np.linalg.norm(self.phrase_embs, axis=-1, keepdims=True)
            self._unit_embs = self.phrase_embs / np.maximum(norms, 1e-12)

    def reseed(self, epoch: int) -> None:
        self.rng = np.random.default_rng(self._seed + epoch)

    def read_cluster_map(self, cluster_map: str):
        with open(cluster_map) as f:
            mapping = json.load(f)
        phrase_to_cluster_idx = {}
        cluster_idx_to_phrases = {}
        phrase_set = set(self.phrases.tolist())
        for cluster_idx, phrases in mapping.items():
            cluster_idx = int(cluster_idx)
            filtered = []
            for phrase in phrases:
                phrase_to_cluster_idx[phrase] = cluster_idx
                if phrase in phrase_set:
                    if (self.max_phrase_len is not None
                            and len(phrase.split()) > self.max_phrase_len):
                        continue
                    filtered.append(phrase)
            cluster_idx_to_phrases[cluster_idx] = filtered
        return cluster_idx_to_phrases, phrase_to_cluster_idx

    def sample_negative_phrases(self, pos_phrases: list, audio_id: str):
        neg_phrase_num = max(0, self.phrase_num - len(pos_phrases))

        if self.fix_neg and audio_id in self.aid_to_neg:
            neg_idxs = list(self.aid_to_neg[audio_id])
            while len(neg_idxs) < neg_phrase_num:
                neg_idxs.extend(neg_idxs)
            return [self.phrases[i] for i in neg_idxs[:neg_phrase_num]]

        pos_idxs = [self.phrase_to_idx[p] for p in pos_phrases
                    if p in self.phrase_to_idx]
        cand_phrases = np.delete(self.phrases, pos_idxs)
        cand_idxs = np.delete(np.arange(len(self.phrases)), pos_idxs)

        if self.neg_samp_stratg == "random":
            neg_phrases = list(self.rng.choice(cand_phrases,
                                               size=neg_phrase_num,
                                               replace=False))
        elif self.neg_samp_stratg == "similarity":
            pos_embs = self._unit_embs[pos_idxs]
            neg_sel: list[int] = []
            self.rng.shuffle(cand_idxs)
            pointer = 0
            while (len(neg_sel) < neg_phrase_num
                   and pointer < len(cand_idxs)):
                left = neg_phrase_num - len(neg_sel)
                part = cand_idxs[pointer:pointer + neg_phrase_num]
                sims = (pos_embs @ self._unit_embs[part].T).max(axis=0)
                ok = np.where(sims < self.sim_threshold)[0]
                neg_sel.extend(part[ok[:left]].tolist())
                pointer += neg_phrase_num
            while neg_sel and len(neg_sel) < neg_phrase_num:
                neg_sel.extend(neg_sel[:neg_phrase_num - len(neg_sel)])
            neg_phrases = [self.phrases[i] for i in neg_sel]
        else:  # clustering
            neg_phrases = []
            pos_clusters = sorted({self.phrase_to_cluster_idx[p]
                                   for p in pos_phrases
                                   if p in self.phrase_to_cluster_idx})
            cand_clusters = np.delete(
                self.cluster_idxs,
                [self.cluster_idx_to_idx[c] for c in pos_clusters
                 if c in self.cluster_idx_to_idx])
            if len(cand_clusters) == 0:
                # degenerate case (every cluster contains a positive — a
                # latent infinite loop in the reference's multi-pass
                # allocation, multi_phrase_dataset.py:248-260): fall back
                # to uniform sampling over non-positive phrases
                neg_phrases = list(self.rng.choice(
                    cand_phrases,
                    size=min(neg_phrase_num, len(cand_phrases)),
                    replace=False))
            elif len(cand_clusters) >= neg_phrase_num:
                chosen = self.rng.choice(cand_clusters,
                                         size=neg_phrase_num, replace=False)
                for c in chosen:
                    pool = self.cluster_idx_to_phrases[c]
                    if pool:
                        neg_phrases.append(str(self.rng.choice(pool)))
            else:
                samp_num = np.zeros(len(cand_clusters), dtype=int)
                remaining = neg_phrase_num
                while remaining > len(cand_clusters):
                    samp_num += 1
                    remaining -= len(cand_clusters)
                if remaining > 0:
                    samp_num[self.rng.choice(len(cand_clusters),
                                             size=remaining,
                                             replace=False)] += 1
                for idx, num in enumerate(samp_num):
                    pool = self.cluster_idx_to_phrases[cand_clusters[idx]]
                    if pool and num:
                        take = self.rng.choice(pool,
                                               size=min(num, len(pool)),
                                               replace=False)
                        neg_phrases.extend(str(p) for p in take)

        while len(neg_phrases) < neg_phrase_num and neg_phrases:
            neg_phrases.append(neg_phrases[-1])

        if self.fix_neg:
            self.aid_to_neg[audio_id] = [self.phrase_to_idx[p]
                                         for p in neg_phrases]
        return neg_phrases

    def __getitem__(self, index):
        audio_item = self.data[index]
        audio_id = audio_item["audio_id"]
        waveform = self.load_audio(audio_id, self.aid_to_fpath[audio_id])
        if (self.max_audio_len is not None
                and waveform.shape[0] > self.max_audio_len):
            start = int(self.rng.integers(
                0, waveform.shape[0] - self.max_audio_len + 1))
            waveform = waveform[start:start + self.max_audio_len]

        pos_phrases = []
        for phrase in audio_item["phrases"][:self.phrase_num]:
            if (self.max_phrase_len is not None
                    and len(phrase.split()) > self.max_phrase_len):
                continue
            pos_phrases.append(phrase)
        neg_phrases = list(self.sample_negative_phrases(pos_phrases,
                                                        audio_id))
        phrases = pos_phrases + neg_phrases
        label = np.array([1.0] * len(pos_phrases)
                         + [0.0] * len(neg_phrases), dtype=np.float32)
        return {"waveform": waveform, "phrases": phrases, "label": label}

    def __len__(self):
        return len(self.data)


@register("SamplePhrasesCountDataset")
class SamplePhrasesCountDataset(AudioSamplePhrasesDataset):
    """Adds per-phrase counts for frequency-weighted losses.

    Reference: datasets/multi_phrase_dataset.py:310-339.
    """

    def __init__(self, *args, **kwargs):
        phrase_count = kwargs.pop("phrase_count")
        super().__init__(*args, **kwargs)
        with open(phrase_count) as f:
            self.phrase_to_count = json.load(f)

    def __getitem__(self, index):
        output = super().__getitem__(index)
        counts = [self.phrase_to_count.get(p, 0) for p in output["phrases"]]
        output["counts"] = np.array(counts, dtype=np.float32)
        return output


@register("AudioCaptionPhrasesEvalDataset")
class AudioCaptionPhrasesEvalDataset(Dataset):
    """Per-phrase eval items (phrase dicts with indices).

    Reference: datasets/multi_phrase_dataset.py:342-378.
    """

    def __init__(self, waveform: str, label: str,
                 max_phrase_words: int = 10):
        self.aid_to_h5 = load_dict_from_csv(waveform,
                                            ("audio_id", "hdf5_path"))
        self.cache: dict = {}
        self.data = _load_label(label)
        self.idxs = [(ai, pi)
                     for ai, item in enumerate(self.data)
                     for pi, _ in enumerate(item["phrases"])]

    def __getitem__(self, index):
        audio_idx, phrase_idx = self.idxs[index]
        item = self.data[audio_idx]
        phrase_item = item["phrases"][phrase_idx]
        waveform = read_from_h5(item["audio_id"],
                                self.aid_to_h5[item["audio_id"]], self.cache)
        return {
            "audiocap_id": item["audiocap_id"],
            "waveform": _as_wire(waveform),
            "phrases": [phrase_item["phrase"]],
            "start_index": phrase_item["start_index"],
            "end_index": phrase_item["end_index"],
        }

    def __len__(self):
        return len(self.idxs)


@register("AudioCaptionPhrasesDataset")
class AudioCaptionPhrasesDataset(Dataset):
    """All caption phrases per audio (filtered by ``max_phrase_words``).

    Reference: datasets/multi_phrase_dataset.py:381-419.
    """

    def __init__(self, waveform: str, label: str,
                 max_phrase_words: int = 10):
        self.aid_to_h5 = load_dict_from_csv(waveform,
                                            ("audio_id", "hdf5_path"))
        self.cache: dict = {}
        self.max_phrase_words = max_phrase_words
        self.data = [
            item for item in _load_label(label)
            if any(len(p["phrase"].split()) <= max_phrase_words
                   for p in item["phrases"])
        ]

    def __getitem__(self, index):
        item = self.data[index]
        waveform = read_from_h5(item["audio_id"],
                                self.aid_to_h5[item["audio_id"]], self.cache)
        phrases = [p["phrase"] for p in item["phrases"]
                   if len(p["phrase"].split()) <= self.max_phrase_words]
        return {
            "audiocap_id": item["audiocap_id"],
            "waveform": _as_wire(waveform),
            "phrases": phrases,
        }

    def __len__(self):
        return len(self.data)


@register("SinglePhraseEvalDataset")
class SinglePhraseEvalDataset(Dataset):
    """Single-phrase (N=1) eval items (reference
    datasets/multi_phrase_dataset.py:422-458)."""

    def __init__(self, waveform: str, label: str, sample_rate: int = 32000):
        self.aid_to_h5 = load_dict_from_csv(waveform,
                                            ("audio_id", "hdf5_path"))
        self.cache: dict = {}
        self.data = _load_label(label)
        self.idxs = [(ai, pi)
                     for ai, item in enumerate(self.data)
                     for pi, _ in enumerate(item["phrases"])]

    def __getitem__(self, index):
        audio_idx, phrase_idx = self.idxs[index]
        item = self.data[audio_idx]
        phrase_item = item["phrases"][phrase_idx]
        waveform = read_from_h5(item["audio_id"],
                                self.aid_to_h5[item["audio_id"]], self.cache)
        return {
            "audiocap_id": item["audiocap_id"],
            "waveform": _as_wire(waveform),
            "phrase": [phrase_item["phrase"]],
            "start_index": phrase_item["start_index"],
            "end_index": phrase_item["end_index"],
        }

    def __len__(self):
        return len(self.idxs)


@register("AudioCaptionDataset")
class AudioCaptionDataset(Dataset):
    """Audio + tokenized caption (word-wise alignment training).

    Reference: datasets/caption_dataset.py:11-46.
    """

    def __init__(self, waveform: str, label: str,
                 max_audio_length: Optional[float] = None,
                 max_cap_length: Optional[int] = None,
                 sample_rate: int = 32000, seed: int = 0):
        self.aid_to_h5 = load_dict_from_csv(waveform,
                                            ("audio_id", "hdf5_path"))
        self.cache: dict = {}
        self.data = _load_label(label)
        self.max_audio_len = (int(max_audio_length * sample_rate)
                              if max_audio_length is not None else None)
        self.max_cap_length = max_cap_length
        self.rng = np.random.default_rng(seed)
        self._seed = seed

    def __getitem__(self, index):
        item = self.data[index]
        waveform = read_from_h5(item["audio_id"],
                                self.aid_to_h5[item["audio_id"]], self.cache)
        waveform = _as_wire(waveform)
        if (self.max_audio_len is not None
                and waveform.shape[0] > self.max_audio_len):
            start = int(self.rng.integers(
                0, waveform.shape[0] - self.max_audio_len + 1))
            waveform = waveform[start:start + self.max_audio_len]
        caption = item["tokens"]
        if self.max_cap_length is not None:
            caption = caption[:self.max_cap_length]
        return {
            "audiocap_id": item["audiocap_id"],
            "waveform": waveform,
            "caption": caption,
        }

    def __len__(self):
        return len(self.data)


@register("AudioCaptionPhraseIndicesDataset")
class AudioCaptionPhraseIndicesDataset(AudioCaptionDataset):
    """Adds phrase start/end token indices (reference
    datasets/caption_dataset.py:49-61)."""

    def __getitem__(self, index):
        output = super().__getitem__(index)
        item = self.data[index]
        output["start_indices"] = [p["start_index"]
                                   for p in item["phrases"]]
        output["end_indices"] = [p["end_index"] for p in item["phrases"]]
        return output
