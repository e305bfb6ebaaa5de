"""Optimizers, LR schedulers, freezing masks, early stopping.

Optimizers are optax chains wrapped in ``inject_hyperparams`` so host-side
schedulers (plateau, cosine-warmup — reference run_strong.py:782-787,
run_weak_phrase.py:432-439) can set the learning rate between steps without
retracing.  ``freeze_*`` flags on models become optax masks (the functional
equivalent of the reference's ``requires_grad=False``,
models/audio_text_model.py:51-56, models/audio_encoder.py:148-152).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
import optax

from texttoaudiogrounding_tpu.utils.registry import register

_OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    # reference configs name torch classes; accept those spellings too
    "torch.optim.Adam": optax.adam,
    "torch.optim.AdamW": optax.adamw,
    "torch.optim.SGD": optax.sgd,
}


def freeze_mask_from_model(model, params: dict) -> Optional[dict]:
    """True = trainable.  Derives the mask from model freeze flags:

    * ``freeze_audio_encoder`` / ``freeze_text_encoder`` (BiEncoder flags);
    * ``audio_encoder.freeze_cnn`` — everything under the audio encoder
      except its ``rnn`` (reference models/audio_encoder.py:148-152);
    * ``text_encoder.freeze_embedding`` — the embedding table only.

    Returns None when nothing is frozen.
    """
    prefixes: list[tuple[str, ...]] = []
    exceptions: list[tuple[str, ...]] = []
    if getattr(model, "freeze_audio_encoder", False):
        prefixes.append(("audio_encoder",))
    if getattr(model, "freeze_text_encoder", False):
        prefixes.append(("text_encoder",))
    audio_enc = getattr(model, "audio_encoder", model)
    if getattr(audio_enc, "freeze_cnn", False):
        prefixes.append(("audio_encoder",))
        exceptions.append(("audio_encoder", "rnn"))
    text_enc = getattr(model, "text_encoder", None)
    if text_enc is not None and getattr(text_enc, "freeze_embedding", False):
        prefixes.append(("text_encoder", "embedding"))
    if getattr(model, "freeze_embedding", False):
        prefixes.append(("embedding",))
    if not prefixes:
        return None

    def trainable(path: tuple) -> bool:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        for exc in exceptions:
            if names[:len(exc)] == exc:
                return True
        for pre in prefixes:
            if names[:len(pre)] == pre:
                return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: trainable(path), params)


def build_optimizer(config: dict, params: Optional[dict] = None,
                    model=None, max_grad_norm: Optional[float] = None):
    """``{"type": "Adam", "args": {"lr": 1e-3, ...}}`` → optax transform.

    The returned transform is ``inject_hyperparams``-wrapped: use
    ``set_learning_rate(opt_state, lr)`` to change LR between steps.
    """
    name = config.get("type", "Adam")
    args = dict(config.get("args", {}))
    lr = args.pop("lr", args.pop("learning_rate", 1e-3))
    if name not in _OPTIMIZERS:
        raise KeyError(f"unknown optimizer {name}")
    if "weight_decay" in args and name in ("Adam", "torch.optim.Adam"):
        # torch Adam applies L2 via weight_decay; adamw is the optax analog
        wd = args.pop("weight_decay")
        base = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=wd, **args)
    else:
        base = optax.inject_hyperparams(_OPTIMIZERS[name])(
            learning_rate=lr, **args)

    chain = [base]
    if max_grad_norm is not None:
        chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
    tx = optax.chain(*chain) if len(chain) > 1 else base

    mask = None
    if model is not None and params is not None:
        mask = freeze_mask_from_model(model, params)
    if mask is not None:
        tx = optax.chain(
            optax.masked(tx, mask),
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda t: not t, mask)),
        )
    return tx


def _find_inject_state(opt_state):
    """Locate the InjectHyperparamsState anywhere in the opt-state tree."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            found = _find_inject_state(sub)
            if found is not None:
                return found
    if hasattr(opt_state, "inner_state"):
        return _find_inject_state(opt_state.inner_state)
    return None


def set_learning_rate(opt_state, lr: float):
    """Functionally replace the injected learning rate in an opt state."""
    import jax.numpy as jnp

    target = _find_inject_state(opt_state)
    if target is None:
        return opt_state
    new_lr = jnp.asarray(lr, dtype=jnp.asarray(
        target.hyperparams["learning_rate"]).dtype)

    def replace(node):
        if node is target:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = new_lr
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and not hasattr(node, "_fields"):
            return tuple(replace(x) for x in node)
        if hasattr(node, "_fields"):  # NamedTuple states
            changed = {}
            for field in node._fields:
                new_val = replace(getattr(node, field))
                if new_val is not getattr(node, field):
                    changed[field] = new_val
            return node._replace(**changed) if changed else node
        return node

    return replace(opt_state)


def get_learning_rate(opt_state) -> float:
    target = _find_inject_state(opt_state)
    if target is None:
        return float("nan")
    return float(target.hyperparams["learning_rate"])


@register("torch.optim.lr_scheduler.ReduceLROnPlateau")
@register("ReduceLROnPlateau")
class ReduceLROnPlateau:
    """torch ``ReduceLROnPlateau`` semantics (used at reference
    run_strong.py:783-785): multiply LR by ``factor`` after ``patience``
    epochs without (rel-threshold) improvement."""

    def __init__(self, mode: str = "min", factor: float = 0.1,
                 patience: int = 10, threshold: float = 1e-4,
                 min_lr: float = 0.0, **_ignored):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad_epochs = 0
        self.lr: Optional[float] = None

    def _is_better(self, value: float) -> bool:
        if self.mode == "min":
            return value < self.best * (1.0 - self.threshold)
        return value > self.best * (1.0 + self.threshold)

    def step(self, metric: float, lr: float) -> float:
        self.lr = lr
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            self.lr = max(lr * self.factor, self.min_lr)
        return self.lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad_epochs": self.num_bad_epochs,
                "lr": self.lr}

    def load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)


@register("CosineWithWarmup")
class CosineWithWarmup:
    """Per-iteration warmup + cosine decay (reference
    run_weak_phrase.py:432-439 cosine-warmup path)."""

    def __init__(self, base_lr: float, warmup_iters: int, total_iters: int,
                 final_lr_ratio: float = 0.0, **_ignored):
        self.base_lr = base_lr
        self.warmup_iters = max(warmup_iters, 1)
        self.total_iters = total_iters
        self.final_lr_ratio = final_lr_ratio

    def __call__(self, iteration: int) -> float:
        if iteration < self.warmup_iters:
            return self.base_lr * (iteration + 1) / self.warmup_iters
        progress = (iteration - self.warmup_iters) / max(
            self.total_iters - self.warmup_iters, 1)
        progress = min(progress, 1.0)
        cos = 0.5 * (1.0 + math.cos(math.pi * progress))
        return self.base_lr * (self.final_lr_ratio
                               + (1 - self.final_lr_ratio) * cos)

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


@register("MetricImprover")
class MetricImprover:
    """Early-stopping monitor (reference utils/train_util.py:326-346)."""

    def __init__(self, mode: str):
        assert mode in ("min", "max")
        self.mode = mode
        self.best_value = np.inf if mode == "min" else -np.inf

    def __call__(self, value: float) -> bool:
        better = (value < self.best_value if self.mode == "min"
                  else value > self.best_value)
        if better:
            self.best_value = value
        return bool(better)

    def state_dict(self) -> dict:
        return dict(self.__dict__)

    def load_state_dict(self, state: dict) -> None:
        self.__dict__.update(state)
