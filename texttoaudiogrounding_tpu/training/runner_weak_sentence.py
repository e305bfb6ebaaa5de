"""Sentence-level WSTAG runner: ranking losses on ``sim [B, B]``.

Reference: python_scripts/training/run_weak_sentence.py.  Evaluation
extracts the diagonal ``sim_matrix[i, i]`` as frame scores, with a
``word_aggregation`` (mean/sum/max) over the word axis for word-wise
models (reference :321-334).
"""

from __future__ import annotations

import math
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from texttoaudiogrounding_tpu.evaluation.decode import decode_multi_threshold
from texttoaudiogrounding_tpu.parallel.mesh import (
    batch_sharding,
    device_feed,
    replicate,
)
from texttoaudiogrounding_tpu.training.runner_base import (array_batch,
                                                           upcast_wire)
from texttoaudiogrounding_tpu.training.runner_strong import (
    build_grounding_ground_truth,
)
from texttoaudiogrounding_tpu.training.runner_weak_phrase import (
    WeakPhraseRunner,
    weak_output_transform,
)
from texttoaudiogrounding_tpu.utils.registry import register

_PHRASE_MODELS = ("AudioTextAlignByPhrase", "AudioTextCrossAlignByPhrase")


@register("WeakSentenceRunner")
class WeakSentenceRunner(WeakPhraseRunner):

    output_transform = staticmethod(weak_output_transform)

    def make_forward(self, model, output_matrix: bool = False):
        mesh = self.mesh
        rep = replicate(mesh)
        data = batch_sharding(mesh)

        def forward(state, batch):
            batch = upcast_wire(batch)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            inputs = dict(batch)
            if output_matrix:
                inputs["output_matrix"] = True
            return model.apply(variables, inputs, train=False)

        return jax.jit(forward)

    def eval_inference(self, dataloader, model, state,
                       scores_per_sample=None) -> dict:
        eval_cfg = self.config.get("eval_config", {})
        n_thresholds = eval_cfg.get("n_thresholds", 50)
        thresholds = np.arange(1 / (n_thresholds * 2), 1, 1 / n_thresholds)
        inf_args = self.config.get("inference_args", {})
        window_size = inf_args.get("window_size", 1)
        time_resolution = inf_args.get("time_resolution",
                                       self._train_time_resolution())
        word_aggregation = inf_args.get("word_aggregation", "mean")
        n_connect = math.ceil(0.5 / time_resolution)

        gt = build_grounding_ground_truth(dataloader.dataset.data)
        valid_fnames = set(gt["gt_df"]["filename"].unique()) \
            if len(gt["gt_df"]) else set()
        model_name = type(model).__name__
        is_phrase_model = model_name in _PHRASE_MODELS

        forward = self.make_forward(model, output_matrix=True)
        n_dev = self.mesh.devices.size
        pred_buffer: dict = {th: [] for th in thresholds}
        score_buffer: dict = {}
        for arr, batch, real_bs in device_feed(iter(dataloader), self.mesh,
                                               n_dev, prepare=array_batch):
            output = forward(state, arr)
            sim_matrix = np.asarray(output["sim_matrix"])
            for idx in range(real_bs):
                fname = (f"{batch['audiocap_id'][idx]}_"
                         f"{batch['start_index'][idx]}")
                if fname not in valid_fnames:
                    continue
                if is_phrase_model:
                    prob = sim_matrix[idx, idx, :, 0]
                else:
                    word_sim = sim_matrix[idx, idx]      # [T, L]
                    if word_aggregation == "mean":
                        prob = word_sim.mean(axis=-1)
                    elif word_aggregation == "sum":
                        prob = word_sim.sum(axis=-1)
                    elif word_aggregation == "max":
                        prob = word_sim.max(axis=-1)
                    else:
                        raise ValueError(word_aggregation)
                    prob = np.clip(prob, 0.0, 1.0)
                timestamps = np.arange(len(prob) + 1) * time_resolution
                score_buffer[fname] = pd.DataFrame({
                    "onset": timestamps[:-1], "offset": timestamps[1:],
                    "fake_event": prob})
                segs = decode_multi_threshold(
                    prob, thresholds, window_size=window_size,
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

    def train(self, config, overrides=None, **kwargs) -> Path:
        self.setup(config, overrides, **kwargs)
        exp_dir = self.prepare_experiment()
        train_loader = self.build_dataloader(self.config["data"]["train"],
                                             shuffle=True)
        val_loader = self.build_dataloader(self.config["data"]["val"],
                                           shuffle=False)
        model = self.build_model()
        loss_fn = self.build_loss()
        # ranking losses may need per-step randomness (RandomTripletLoss)
        self.fit(model, loss_fn, train_loader, val_loader,
                 self.output_transform, exp_dir, loss_rng=True)
        return exp_dir
