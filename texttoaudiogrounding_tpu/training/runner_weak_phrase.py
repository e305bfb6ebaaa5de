"""Phrase-level WSTAG runner (MIL clip-BCE training) + self-supervision.

Reference: python_scripts/training/run_weak_phrase.py and
run_weak_phrase_self_supervision.py.  Training supervises ``clip_sim
[B, N]`` against the positive/negative phrase labels; evaluation feeds
single-phrase items (text unsqueezed to N=1, reference :48-50) through the
same decode + PSDS/th-AUC pipeline as the strong runner.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.training.runner_base import (array_batch,
                                                           upcast_wire)
from texttoaudiogrounding_tpu.training.runner_strong import StrongRunner
from texttoaudiogrounding_tpu.utils.registry import instantiate, register


def weak_output_transform(output: dict, batch: dict) -> dict:
    """Merge batch supervision (label/counts/...) into the model output
    (reference ``output.update(batch)``, run_weak_phrase.py:54-57)."""
    merged = dict(batch)
    merged.update(output)
    return merged


@register("WeakPhraseRunner")
class WeakPhraseRunner(StrongRunner):

    output_transform = staticmethod(weak_output_transform)
    # reference run_weak_phrase.py:332-353 keeps frozen towers (e.g. the
    # CLAP text encoder) out of best/last checkpoints
    save_trainable_only = True

    def post_grad_hook(self, loss, grads):
        """NaN-loss guard (reference run_weak_phrase.py:88-93): non-finite
        losses zero the gradients so the step is a no-op."""
        finite = jnp.isfinite(loss)
        return jax.tree.map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)

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
                 self.output_transform, exp_dir)
        return exp_dir

    # ------------------------------------------------------------ inference
    def eval_inference(self, dataloader, model, state,
                       scores_per_sample=None) -> dict:
        """Single-phrase eval: unsqueeze text keys to N=1 and read
        ``frame_sim[:, :, 0]`` (reference run_weak_phrase.py:48-50)."""
        text_keys = tuple(getattr(model, "text_forward_keys",
                                  ("text", "text_len")))

        class _Unsqueeze:
            """Loader proxy inserting the N=1 phrase axis per batch."""

            def __init__(self, inner):
                self.inner = inner
                self.dataset = inner.dataset

            def __iter__(self):
                for batch in self.inner:
                    out = dict(batch)
                    for key in text_keys:
                        if key in out and isinstance(out[key], np.ndarray):
                            out[key] = out[key][:, None]
                    yield out

            def __len__(self):
                return len(self.inner)

        return super().eval_inference(_Unsqueeze(dataloader), model, state,
                                      scores_per_sample=scores_per_sample)

    def _train_time_resolution(self) -> float:
        cfg = self.config.get("inference_args", {})
        if "time_resolution" in cfg:
            return cfg["time_resolution"]
        try:
            return self.config["data"]["train"]["dataset"]["args"][
                "time_resolution"]
        except KeyError:
            return 0.04


@register("WeakPhraseSelfSupervisionRunner")
class WeakPhraseSelfSupervisionRunner(WeakPhraseRunner):
    """WSTAG + frozen-teacher self-supervision.

    Reference: run_weak_phrase_self_supervision.py:24-50 — the teacher runs
    in the same step under stop_gradient; ``label = max(dataset label,
    teacher clip_sim)`` and the teacher's frame_sim becomes ``frame_label``
    for ``ClipFrameBceLoss``.
    """

    def build_teacher(self):
        teacher_cfg = self.config["teacher"]
        model = instantiate(teacher_cfg)
        ckpt = teacher_cfg.get("checkpoint")
        return model, ckpt

    def _load_teacher_variables(self, teacher, ckpt, sample_batch):
        from texttoaudiogrounding_tpu.training.train_state import (
            load_checkpoint,
            merge_matched_params,
        )
        variables = teacher.init({"params": jax.random.PRNGKey(0)},
                                 upcast_wire(array_batch(sample_batch)),
                                 train=False)
        if ckpt is not None:
            payload, meta = load_checkpoint(ckpt)
            params = payload["params"]
            if meta.get("trainables_only"):
                params = merge_matched_params(variables["params"], params,
                                              log_fn=self.logger.info)
            variables = {"params": params,
                         "batch_stats": payload.get(
                             "batch_stats", variables.get("batch_stats",
                                                          {}))}
        return variables

    def train(self, config, overrides=None, **kwargs) -> Path:
        self.setup(config, overrides, **kwargs)
        exp_dir = self.prepare_experiment()
        train_loader = self.build_dataloader(self.config["data"]["train"],
                                             shuffle=True)
        val_loader = self.build_dataloader(self.config["data"]["val"],
                                           shuffle=False)
        model = self.build_model()
        loss_fn = self.build_loss()

        teacher, ckpt = self.build_teacher()
        sample = next(iter(train_loader))
        teacher_vars = self._load_teacher_variables(teacher, ckpt, sample)

        def output_transform(output, batch):
            t_out = teacher.apply(jax.lax.stop_gradient(teacher_vars),
                                  batch, train=False)
            merged = dict(batch)
            merged.update(output)
            merged["label"] = jnp.maximum(
                batch["label"], jax.lax.stop_gradient(t_out["clip_sim"]))
            merged["frame_label"] = jax.lax.stop_gradient(
                t_out["frame_sim"])
            return merged

        self.fit(model, loss_fn, train_loader, val_loader,
                 output_transform, exp_dir)
        return exp_dir
