"""Class-mapping SED runners: AudioTagging over phrase→class labels.

Reference: python_scripts/training/mapping_to_class/run_strong.py (strong
frame labels; eval reads ``frame_sim[idx, :, text_idx]``, :202-228) and
run_weak.py (weak tagging with mixup/specaug, tagging mAP eval, :34-103).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.parallel.mesh import device_feed

from texttoaudiogrounding_tpu.training.runner_base import array_batch
from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner
from texttoaudiogrounding_tpu.training.runner_weak_phrase import (
    weak_output_transform,
)
from texttoaudiogrounding_tpu.utils.config import parse_config_or_kwargs
from texttoaudiogrounding_tpu.utils.registry import register


def _mixup_lambdas(rng: np.ndarray, batch_size: int,
                   alpha: float = 1.0) -> np.ndarray:
    """Paired mixup coefficients (reference utils/train_util.py:48-70)."""
    lams = []
    for _ in range(0, batch_size, 2):
        lam = float(rng.beta(alpha, alpha))
        lams.extend([lam, 1.0 - lam])
    return np.array(lams[:batch_size], np.float32)


def mapping_strong_output_transform(output: dict, batch: dict) -> dict:
    """Merge batch supervision and truncate the padded ``strong_label``
    ``[N, T, C]`` to the model's frame count (reference run_strong.py:
    107-118 truncation, inherited by mapping_to_class/run_strong.py)."""
    import jax.numpy as jnp

    merged = weak_output_transform(output, batch)
    if "strong_label_mask" not in merged and "weak_label" in merged:
        # kmeans/spectral strong datasets emit class presence as
        # ``weak_label`` — the same per-class mask ASMappingStrong calls
        # ``strong_label_mask``
        merged["strong_label_mask"] = merged["weak_label"]
    if "strong_label" in merged:
        frame_sim = merged["frame_sim"]
        label = merged["strong_label"].astype(frame_sim.dtype)
        t = min(frame_sim.shape[1], label.shape[1])
        merged["frame_sim"] = frame_sim[:, :t]
        merged["strong_label"] = label[:, :t]
        merged["length"] = jnp.clip(merged["length"], 1, t)
    return merged


@register("ClassMappingStrongRunner")
class ClassMappingStrongRunner(StrongRunner):
    """Strong class-mapping training (MaskedFrameBceLoss family) + PSDS
    eval slicing the matched class channel."""

    def train(self, config, overrides=None, **kwargs) -> Path:
        self.setup(config, overrides, **kwargs)
        exp_dir = self.prepare_experiment()
        train_loader = self.build_dataloader(self.config["data"]["train"],
                                             shuffle=True)
        val_loader = self.build_dataloader(self.config["data"]["val"],
                                           shuffle=False)
        model = self.build_model()
        loss_fn = self.build_loss()
        self.fit(model, loss_fn, train_loader, val_loader,
                 mapping_strong_output_transform, exp_dir)
        return exp_dir

    def eval_inference(self, dataloader, model, state,
                       scores_per_sample=None) -> dict:
        """Per-sample scores come from the phrase's mapped class channel
        ``frame_sim[idx, :, text_idx]`` (reference
        mapping_to_class/run_strong.py:202-228)."""
        import math

        from texttoaudiogrounding_tpu.evaluation.decode import \
            decode_multi_threshold
        from texttoaudiogrounding_tpu.training.runner_strong import \
            build_grounding_ground_truth

        eval_cfg = self.config.get("eval_config", {})
        n_thresholds = eval_cfg.get("n_thresholds", 50)
        thresholds = np.arange(1 / (n_thresholds * 2), 1, 1 / n_thresholds)
        window_size = self.config.get("inference_args",
                                      {}).get("window_size", 1)
        time_resolution = self._train_time_resolution()
        n_connect = math.ceil(0.5 / time_resolution)

        gt = build_grounding_ground_truth(dataloader.dataset.data)
        valid_fnames = set(gt["gt_df"]["filename"].unique()) \
            if len(gt["gt_df"]) else set()
        forward = self.make_forward(model)
        n_dev = self.mesh.devices.size
        pred_buffer: dict = {th: [] for th in thresholds}
        score_buffer: dict = {}
        for arr, batch, real_bs in device_feed(iter(dataloader), self.mesh,
                                               n_dev, prepare=array_batch):
            output = forward(state, arr)
            frame_sim = np.asarray(output["frame_sim"])
            lengths = np.asarray(output["length"])
            for idx in range(real_bs):
                fname = (f"{batch['audiocap_id'][idx]}_"
                         f"{batch['start_index'][idx]}")
                if fname not in valid_fnames:
                    continue
                text_idx = int(np.asarray(batch["text_idx"])[idx])
                scores = frame_sim[idx, :max(int(lengths[idx]), 1),
                                   text_idx]
                timestamps = np.arange(len(scores) + 1) * time_resolution
                score_buffer[fname] = pd.DataFrame({
                    "onset": timestamps[:-1], "offset": timestamps[1:],
                    "fake_event": scores})
                segs = decode_multi_threshold(
                    scores, thresholds, window_size=window_size,
                    connect_n=n_connect, time_resolution=time_resolution)
                for th, seg in zip(thresholds, segs):
                    for onset, offset in seg:
                        pred_buffer[th].append(
                            {"filename": fname,
                             "event_label": "fake_event",
                             "onset": onset, "offset": offset})
        for th in thresholds:
            pred_buffer[th] = pd.DataFrame(
                pred_buffer[th],
                columns=["filename", "event_label", "onset", "offset"])
        return {"pred_buffer": pred_buffer, "score_buffer": score_buffer,
                **gt}


@register("ClassMappingWeakRunner")
class ClassMappingWeakRunner(ClassMappingStrongRunner):
    """Weak class-mapping (audio tagging) with mixup + specaug.

    Reference: mapping_to_class/run_weak.py:34-58 — mixup lambdas are drawn
    host-side per batch and both spectrogram and labels are mixed inside
    the jitted step (the model mixes features, the transform mixes labels).
    """

    def fit(self, model, loss_fn, train_loader, val_loader,
            output_transform, exp_dir, loss_rng: bool = False):
        use_mixup = self.config.get("mixup", False)
        use_specaug = self.config.get("specaug", False)
        if use_specaug:
            # static flag merged into the jitted step's inputs (the model
            # branches on it at trace time)
            self._static_train_inputs = {"specaug": True}
        mix_rng = np.random.RandomState(self.config.get("seed", 1) + 1234)

        base_loader = train_loader

        class _AugLoader:
            """Injects specaug flag + per-batch mixup lambdas host-side."""

            def __init__(self, inner):
                self.inner = inner
                self.dataset = inner.dataset

            def set_epoch(self, epoch):
                self.inner.set_epoch(epoch)

            def __len__(self):
                return len(self.inner)

            def __iter__(self):
                for batch in self.inner:
                    out = dict(batch)
                    if use_mixup:
                        b = out["waveform"].shape[0]
                        out["mixup_lambda"] = _mixup_lambdas(mix_rng, b)
                    yield out

        def transform(output, batch):
            merged = weak_output_transform(output, batch)
            if use_mixup and "mixup_lambda" in batch:
                from texttoaudiogrounding_tpu.models.layers import do_mixup
                merged["label"] = do_mixup(batch["label"],
                                           batch["mixup_lambda"])
            return merged

        return super(ClassMappingStrongRunner, self).fit(
            model, loss_fn, _AugLoader(base_loader), val_loader,
            transform, exp_dir, loss_rng=loss_rng)

    def evaluate_tagging(self, experiment_path, eval_config, overrides=None,
                         **kwargs) -> pd.DataFrame:
        """Per-class average precision (reference
        mapping_to_class/run_weak.py:60-103)."""
        from sklearn.metrics import average_precision_score

        eval_config = parse_config_or_kwargs(eval_config, overrides or [],
                                             **kwargs)
        exp_dir = Path(experiment_path)
        self.setup(exp_dir / "config.yaml")
        model = self.build_model()
        val_cfg = self.config["data"]["val"]
        dataloader = self.build_dataloader(val_cfg, shuffle=False)
        sample = next(iter(dataloader))
        state = self.restore_state(model, exp_dir, sample)
        forward = self.make_forward(model)
        n_dev = self.mesh.devices.size
        probs, labels = [], []
        for arr, batch, real_bs in device_feed(iter(dataloader), self.mesh,
                                               n_dev, prepare=array_batch):
            output = forward(state, arr)
            probs.append(np.asarray(output["clip_sim"])[:real_bs])
            labels.append(np.asarray(batch["label"])[:real_bs])
        probs = np.concatenate(probs)
        labels = np.concatenate(labels)
        ap = average_precision_score(labels, probs, average=None)
        result = pd.DataFrame({"label_index": range(labels.shape[1]),
                               "ap": ap}).fillna(0)
        out = eval_config.get("output")
        if out:
            result.to_csv(exp_dir / out, sep="\t", index=False)
        print(f"tagging mAP: {result['ap'].mean():.4f}")
        return result
