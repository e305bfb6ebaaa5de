"""Single-clip inference + the public grounding API.

* ``GroundingPredictor`` — the deployment contract of the reference's HF
  ``AutoModel`` wrapper (models/hf_modeling_grounding.py:338-352):
  ``predict(audio [B, N], audio_len [B], text List[str]) → frame
  probabilities at 40 ms resolution`` — tokenization inside, jitted,
  shape-bucketed.
* ``run_inference`` — CLI single-clip inference with decode + probability
  plot (reference python_scripts/inference/inference.py:90-163).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from texttoaudiogrounding_tpu.data.collate import round_up
from texttoaudiogrounding_tpu.evaluation.decode import (
    find_contiguous_regions,
    median_filter,
)
from texttoaudiogrounding_tpu.utils.config import parse_config_or_kwargs
from texttoaudiogrounding_tpu.utils.registry import instantiate


class GroundingPredictor:
    """Batched text-to-audio grounding inference.

    Built from a trained experiment directory (config.yaml + checkpoint),
    mirroring the reference HF deployment model's forward contract
    (models/hf_modeling_grounding.py:338-352).
    """

    def __init__(self, model, variables, tokenizer,
                 time_resolution: float = 0.04,
                 audio_bucket: int = 32000, text_bucket: int = 4,
                 batch_buckets: tuple = (1, 8, 16, 32, 64, 128),
                 mesh=None):
        """``mesh``: an optional ``jax.sharding.Mesh`` with a ``data``
        axis — serving then shards the batch over it (GSPMD data
        parallelism, parameters replicated), so multi-chip serving
        scales linearly without code changes; batches that don't divide
        the mesh are padded and trimmed transparently.

        ``batch_buckets``: incoming batches are SPLIT into bucket-sized
        sub-batches — chunks of the largest bucket while the remainder
        exceeds it, then one final chunk padded up to the smallest
        listed size that covers the rest.  This bounds compile count
        AND keeps every launched batch on a measured serving sweet
        spot: off-bucket batches run far slower than their split
        (B=144 runs 2647 clips/s monolithic vs ~3730 as 128+16;
        B=256 runs 3607 monolithic vs 3873 as 2x128 — STATUS.md batch
        envelope).  Padded rows repeat the last clip and are trimmed
        from the output.  Pass ``()``/None to run exact incoming
        sizes."""
        import jax

        self.model = model
        self.tokenizer = tokenizer
        self.time_resolution = time_resolution
        self.audio_bucket = audio_bucket
        self.text_bucket = text_bucket
        self.batch_buckets = tuple(sorted(batch_buckets or ()))
        self.mesh = mesh
        fwd = lambda v, b: self.model.apply(v, b, train=False)  # noqa: E731
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from texttoaudiogrounding_tpu.parallel.kernel_shard import \
                wrap_calls
            from texttoaudiogrounding_tpu.parallel.mesh import replicate
            rep = replicate(mesh)
            self.variables = jax.device_put(variables, rep)
            data = NamedSharding(mesh, P("data"))
            self._batch_multiple = int(mesh.shape["data"])
            # kernel_mesh context: the fused Pallas kernels shard_map
            # themselves over the data axis instead of forcing operand
            # replication (parallel/kernel_shard.py)
            self._forward = wrap_calls(
                jax.jit(fwd, in_shardings=(rep, data),
                        out_shardings=data), mesh)
        else:
            self.variables = variables
            self._batch_multiple = 1
            self._forward = jax.jit(fwd)

    @classmethod
    def from_experiment(cls, experiment_path: str, which: str = "best",
                        mesh=None, batch_buckets: tuple | None = None
                        ) -> "GroundingPredictor":
        """``batch_buckets``: override the padding buckets (pass ``()``
        to run exact incoming sizes).  When ``None``, uses the config's
        ``inference_args.batch_buckets`` if present, else the class
        default — callers with known odd batch sizes (e.g. the DESED
        per-clip class sweep) can tune or disable bucketing here."""
        from texttoaudiogrounding_tpu.training.train_state import \
            load_checkpoint
        exp_dir = Path(experiment_path)
        config = parse_config_or_kwargs(exp_dir / "config.yaml")
        model = instantiate(config["model"])
        payload, meta = load_checkpoint(exp_dir / which)
        params = payload["params"]
        if meta.get("trainables_only"):
            # merge the trainable subset over a fresh init (reference
            # load_pretrained_base merge semantics)
            import jax

            from texttoaudiogrounding_tpu.training.train_state import \
                merge_matched_params
            dummy = {
                "waveform": np.zeros((1, 32000), np.float32),
                "waveform_len": np.array([32000], np.int32),
                "text": np.zeros((1, 4), np.int32),
                "text_len": np.array([4], np.int32),
            }
            if hasattr(model, "text_forward_keys"):
                dummy["text"] = dummy["text"][:, None]
                dummy["text_len"] = dummy["text_len"][:, None]
            init_vars = model.init({"params": jax.random.PRNGKey(0)},
                                   dummy, train=False)
            params = merge_matched_params(init_vars["params"], params,
                                          log_fn=lambda *_: None)
        variables = {"params": params}
        if payload.get("batch_stats"):
            variables["batch_stats"] = payload["batch_stats"]
        tokenizer = instantiate(
            config["data"]["train"]["collate_fn"]["args"]["tokenizer"])
        time_res = config["data"]["train"]["dataset"]["args"].get(
            "time_resolution",
            config.get("inference_args", {}).get("time_resolution", 0.04))
        kwargs = {}
        if batch_buckets is None:
            batch_buckets = config.get("inference_args", {}).get(
                "batch_buckets")
        if batch_buckets is not None:
            kwargs["batch_buckets"] = tuple(batch_buckets)
        return cls(model, variables, tokenizer, time_resolution=time_res,
                   mesh=mesh, **kwargs)

    def predict(self, audio: np.ndarray, audio_len: np.ndarray,
                text: List[str],
                return_length: bool = False) -> np.ndarray:
        """``audio [B, N]``, ``audio_len [B]``, ``text`` (B strings) →
        frame probabilities ``[B, T]`` (padded frames zeroed).

        ``return_length=True`` additionally returns the model's exact
        per-clip valid frame counts ``[B]`` (the reference length
        arithmetic, models/hf_modeling_grounding.py:170-178)."""
        audio = np.atleast_2d(np.asarray(audio, np.float32))
        audio_len = np.asarray(audio_len, np.int32).reshape(-1)
        pad_n = round_up(audio.shape[1], self.audio_bucket)
        audio = np.pad(audio, ((0, 0), (0, pad_n - audio.shape[1])))
        tokens = self.tokenizer(list(text))
        text_ids = tokens["text"]
        pad_l = round_up(text_ids.shape[1], self.text_bucket)
        text_ids = np.pad(text_ids, ((0, 0), (0, pad_l - text_ids.shape[1])))
        batch = {
            "waveform": audio,
            "waveform_len": audio_len,
            "text": text_ids.astype(np.int32),
            "text_len": np.asarray(tokens["text_len"], np.int32),
        }
        # MultiText models expect a phrase axis: [B, L] → [B, 1, L]
        # (reference eval unsqueeze, run_weak_phrase.py:48-50)
        if hasattr(self.model, "text_forward_keys"):
            batch["text"] = batch["text"][:, None]
            batch["text_len"] = batch["text_len"][:, None]
        real_b = batch["waveform"].shape[0]
        sims, lens = [], []
        for start, size, target in self._chunk_plan(real_b):
            chunk = {k: v[start:start + size] for k, v in batch.items()}
            if target != size:
                from texttoaudiogrounding_tpu.parallel.mesh import \
                    pad_batch_to_multiple
                # size <= target, so padding to a multiple of ``target``
                # pads to exactly ``target`` rows
                chunk, _ = pad_batch_to_multiple(chunk, target)
            out = self._forward(self.variables, chunk)
            frame_sim = np.asarray(out["frame_sim"])[:size]
            if frame_sim.ndim == 3:
                frame_sim = frame_sim[..., 0]
            sims.append(frame_sim)
            lens.append(np.asarray(out["length"])[:size])
        frame_sim = np.concatenate(sims) if len(sims) > 1 else sims[0]
        lengths = np.concatenate(lens) if len(lens) > 1 else lens[0]
        mask = np.arange(frame_sim.shape[1])[None] < lengths[:, None]
        masked = frame_sim * mask
        if return_length:
            return masked, lengths
        return masked

    def _chunk_plan(self, b: int) -> list[tuple[int, int, int]]:
        """Split a batch of ``b`` rows into (start, size, padded_target)
        sub-batches per the bucket policy (see ``__init__``)."""
        if not self.batch_buckets:
            target = b
            if self._batch_multiple > 1:
                target = round_up(b, self._batch_multiple)
            return [(0, b, target)]
        largest = self.batch_buckets[-1]
        full_target = largest
        if self._batch_multiple > 1:
            # A mesh data axis must divide every padded sub-batch — the
            # largest bucket included (it is user-overridable and need
            # not align with the mesh).
            full_target = round_up(largest, self._batch_multiple)
        plan = []
        start = 0
        while b - start > largest:
            plan.append((start, largest, full_target))
            start += largest
        rest = b - start
        bigger = [x for x in self.batch_buckets if x >= rest]
        target = bigger[0] if bigger else largest
        if self._batch_multiple > 1:
            target = round_up(target, self._batch_multiple)
        plan.append((start, rest, target))
        return plan

    def ground(self, audio: np.ndarray, audio_len, text: List[str],
               threshold: float = 0.5, window_size: int = 1
               ) -> list[list[tuple[float, float]]]:
        """Decode per-clip (onset, offset) second segments."""
        probs, lengths = self.predict(audio, audio_len, text,
                                      return_length=True)
        results = []
        for prob, n in zip(probs, lengths):
            n = max(int(n), 1)
            filtered = median_filter(prob[None, :n], window_size=window_size,
                                     threshold=threshold)[0]
            segs = find_contiguous_regions(filtered) * self.time_resolution
            results.append([tuple(map(float, row)) for row in segs])
        return results


def run_inference(experiment_path: str, audio: str, phrase: str,
                  output: Optional[str] = None, sample_rate: int = 32000,
                  threshold: float = 0.5, which: str = "best"):
    """CLI single-clip inference (reference
    python_scripts/inference/inference.py:90-163): decode segments, print
    them, and write a probability plot."""
    from texttoaudiogrounding_tpu.data.h5io import load_wav

    predictor = GroundingPredictor.from_experiment(experiment_path,
                                                   which=which)
    waveform = load_wav(audio, sample_rate)
    duration = waveform.shape[0] / sample_rate
    probs, lengths = predictor.predict(waveform[None], [waveform.shape[0]],
                                       [phrase], return_length=True)
    prob = probs[0][:max(int(lengths[0]), 1)]

    filtered = median_filter(prob[None, :], window_size=1,
                             threshold=threshold)[0]
    segments = [[row[0] * predictor.time_resolution,
                 row[1] * predictor.time_resolution]
                for row in find_contiguous_regions(filtered)]
    print(segments)

    if output is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.figure(figsize=(14, 5))
        plt.plot(prob)
        plt.axhline(y=threshold, color="r", linestyle="--")
        xlabels = [f"{x:.2f}" for x in np.arange(0, duration, duration / 5)]
        plt.xticks(ticks=np.arange(0, len(prob), len(prob) / 5),
                   labels=xlabels, fontsize=15)
        plt.xlabel("Time / second", fontsize=14)
        plt.ylabel("Probability", fontsize=14)
        plt.ylim(0, 1)
        out_path = Path(output)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        plt.savefig(out_path, bbox_inches="tight", dpi=150)
        plt.close()
    return segments
