"""Collate functions: list of sample dicts → batch dict of NumPy arrays.

Ports of the reference collates (datasets/collate_function.py:7-133) with a
TPU-critical addition: **shape bucketing**.  Variable-length keys are padded
not just to the batch max but up to a bucket boundary (round-up to a
multiple), so the number of distinct compiled shapes under ``jit`` stays
bounded (XLA recompiles per shape).
"""

from __future__ import annotations

import numpy as np

from texttoaudiogrounding_tpu.utils.registry import register

# NumPy madvise(HUGEPAGE)s every allocation >= 4 MB; for a loader that
# allocates a fresh ~80 MB batch per step from several worker threads,
# the kernel's direct compaction then stalls allocations for SECONDS
# under concurrency (measured: 1.8-3.3 s/batch vs 51 ms with the
# madvise off, flat from 1 to 8 threads).  Batch buffers are written
# once and consumed once, so hugepages buy nothing here anyway.
try:
    np._core.multiarray._set_madvise_hugepage(False)
except AttributeError:  # older numpy
    try:
        np.core.multiarray._set_madvise_hugepage(False)  # noqa: NPY201
    except Exception:  # pragma: no cover - numpy without the knob
        pass


def round_up(x: int, multiple: int) -> int:
    return -(-x // multiple) * multiple


def pad_sequence(data: list[np.ndarray], pad_to: int | None = None,
                 bucket: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of [Ti, ...] arrays to [B, T, ...]; T = max Ti rounded up
    to ``bucket`` (or exactly ``pad_to``).

    Reference: utils/train_util.py:211-216 (+ bucketing).
    """
    arrs = [np.asarray(a) for a in data]
    lens = np.array([a.shape[0] for a in arrs], dtype=np.int64)
    t = int(lens.max()) if pad_to is None else pad_to
    t = round_up(max(t, 1), bucket)
    # batch dtype: rows agree in the common case; a corpus mixing f16-
    # packed and f32 HDF5 sources must NOT downcast f32 rows (nor
    # flip-flop the batch dtype with whichever clip lands first, which
    # would retrace jit) — promote to the common type instead
    dt = arrs[0].dtype
    if any(a.dtype != dt for a in arrs):
        dt = np.result_type(*[a.dtype for a in arrs])
    # np.empty + per-row tail zeroing instead of np.zeros: full-length
    # rows (the common case for fixed-duration clips) then cost ONE
    # memcpy instead of two full writes — this pad is on the loader's
    # critical path at ~82 MB per B=128 waveform batch
    out = np.empty((len(arrs), t) + arrs[0].shape[1:], dtype=dt)
    if out.nbytes > (1 << 20) and _pack_native(out, arrs, t):
        return out, np.minimum(lens, t)
    for i, a in enumerate(arrs):
        n = min(a.shape[0], t)
        out[i, :n] = a[:n]
        if n < t:
            out[i, n:] = 0
    return out, np.minimum(lens, t)


def _pack_native(out: np.ndarray, arrs: list, t: int) -> bool:
    """Large batches pack via the native GIL-releasing memcpy kernel
    (native/decode.cpp pack_rows) so loader worker threads pad
    concurrently; row tails zero-fill, overlong rows truncate to ``t``."""
    dt, trail = arrs[0].dtype, arrs[0].shape[1:]
    if dt == object or any(
            not a.flags.c_contiguous or a.dtype != dt
            or a.shape[1:] != trail for a in arrs):
        return False
    from texttoaudiogrounding_tpu.native import pack_rows_native
    return pack_rows_native(out, arrs)


def _gather(data_batch: list[dict]) -> dict:
    output: dict[str, list] = {}
    for data in data_batch:
        for key, value in data.items():
            output.setdefault(key, []).append(value)
    return output


def _stack_or_list(values: list):
    if isinstance(values[0], (np.ndarray, int, float, bool,
                              np.integer, np.floating, np.bool_)):
        return np.array(values)
    return values  # strings / ragged metadata stay python lists


class _CollateBase:
    def __init__(self, pad_keys=(), sort_key=None, pad_buckets=None,
                 pad_to=None):
        self.pad_keys = list(pad_keys)
        self.sort_key = sort_key
        self.pad_buckets = dict(pad_buckets or {})
        self.pad_to = dict(pad_to or {})

    def _pad(self, key: str, values: list[np.ndarray]):
        return pad_sequence(values, pad_to=self.pad_to.get(key),
                            bucket=self.pad_buckets.get(key, 1))

    def _sort(self, data_batch: list[dict]) -> list[dict]:
        if self.sort_key is not None:
            data_batch = sorted(data_batch,
                                key=lambda x: len(x[self.sort_key]),
                                reverse=True)
        return data_batch


@register("VarLenPadCollate")
class VarLenPadCollate(_CollateBase):
    """Pad listed keys, stack the rest (reference
    datasets/collate_function.py:7-40)."""

    def __call__(self, data_batch: list[dict]) -> dict:
        data_batch = self._sort(data_batch)
        gathered = _gather(data_batch)
        output = {}
        for key, values in gathered.items():
            if key in self.pad_keys:
                output[key], output[f"{key}_len"] = self._pad(key, values)
            else:
                output[key] = _stack_or_list(values)
        return output


@register("TextCollate")
class TextCollate(_CollateBase):
    """VarLenPadCollate + tokenizer on the ``text_key`` column (reference
    datasets/collate_function.py:43-84)."""

    def __init__(self, tokenizer, text_key="text", pad_keys=(),
                 sort_key=None, pad_buckets=None, pad_to=None,
                 text_bucket: int = 1):
        super().__init__(pad_keys, sort_key, pad_buckets, pad_to)
        self.tokenizer = tokenizer
        self.text_key = text_key
        self.text_bucket = text_bucket

    def _bucket_text(self, tokens: dict) -> dict:
        if self.text_bucket <= 1:
            return tokens
        out = dict(tokens)
        for k, v in tokens.items():
            if k.endswith("_len") or v.ndim < 2:
                continue
            t = round_up(v.shape[-1], self.text_bucket)
            pad = [(0, 0)] * (v.ndim - 1) + [(0, t - v.shape[-1])]
            out[k] = np.pad(v, pad)
        return out

    def __call__(self, data_batch: list[dict]) -> dict:
        data_batch = self._sort(data_batch)
        gathered = _gather(data_batch)
        output = {"text_key": self.text_key}
        for key, values in gathered.items():
            if key in self.pad_keys:
                output[key], output[f"{key}_len"] = self._pad(key, values)
            elif key == self.text_key:
                output.update(self._bucket_text(self.tokenizer(values)))
            else:
                output[key] = _stack_or_list(values)
        return output


@register("VarNumTextCollate")
class VarNumTextCollate(TextCollate):
    """Flattens a variable number of phrases per sample to ``text [sum(N),
    L]`` + ``text_num [B]`` (reference datasets/collate_function.py:87-133)."""

    def __call__(self, data_batch: list[dict]) -> dict:
        data_batch = self._sort(data_batch)
        gathered = _gather(data_batch)
        output = {"text_key": self.text_key}
        for key, values in gathered.items():
            if key in self.pad_keys:
                output[key], output[f"{key}_len"] = self._pad(key, values)
            elif key == self.text_key:
                nums = np.array([len(x) for x in values])
                output[f"{key}_num"] = nums
                merged = [t for tl in values for t in tl]
                tokens = self._bucket_text(self.tokenizer(merged))
                output[key] = tokens["text"]
                output[f"{key}_len"] = tokens["text_len"]
                # static-shape gather map: flat row index of phrase n of
                # sample b (0 for padding; mask with {key}_num) — lets jitted
                # models re-pack the ragged flat layout without dynamic
                # splits (reference uses torch.split + pad_sequence,
                # models/audio_text_model.py:956-957)
                max_num = int(nums.max()) if len(nums) else 1
                pad_index = np.zeros((len(nums), max_num), np.int64)
                offset = 0
                for b, n in enumerate(nums):
                    pad_index[b, :n] = np.arange(offset, offset + n)
                    offset += n
                output[f"{key}_pad_index"] = pad_index
            else:
                output[key] = _stack_or_list(values)
        return output
