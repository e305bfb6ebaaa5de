"""Train state + checkpointing.

Checkpoint layout mirrors the reference's ``best.pth``/``last.pth`` content
(reference run_strong.py:679-690): variables + epoch + metric-monitor state
(+ optimizer state when ``include_optim_in_ckpt``), serialized with orbax
into a directory per checkpoint.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def prune_tree_by_mask(tree, mask):
    """Keep only leaves whose mask entry is True; drop empty subtrees.

    The JAX analog of the reference's trainable-only checkpoint filter
    (run_weak_phrase.py:332-353, ``requires_grad`` params only): ``mask``
    is the optimizer freeze mask (True = trainable).  Returns plain nested
    dicts (orbax-serializable)."""
    if hasattr(tree, "items"):
        out = {}
        for key, value in tree.items():
            sub = prune_tree_by_mask(value, mask[key])
            if isinstance(sub, dict):
                if sub:
                    out[key] = sub
            elif sub is not None:
                out[key] = sub
        return out
    return tree if mask else None


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, epoch: int,
                    metric_monitor: dict, not_improve_cnt: int,
                    include_optim: bool = True,
                    trainable_mask: Optional[dict] = None) -> None:
    """``trainable_mask`` (True = trainable) switches to trainable-only
    saving: frozen params are pruned from the checkpoint while batch_stats
    (the buffer analog) are always kept — reference
    run_weak_phrase.py:332-353 keeps frozen pretrained towers out of
    best/last checkpoints."""
    ckpt_dir = Path(ckpt_dir).absolute()
    if ckpt_dir.exists():
        import shutil
        shutil.rmtree(ckpt_dir)
    params = state.params
    trainables_only = trainable_mask is not None
    if trainables_only:
        params = prune_tree_by_mask(params, trainable_mask)
    payload = {"params": params, "batch_stats": state.batch_stats}
    if include_optim:
        payload["opt_state"] = state.opt_state
    ckpt = _checkpointer()
    ckpt.save(ckpt_dir, payload)
    ckpt.wait_until_finished()
    meta = {"epoch": epoch, "metric_monitor": metric_monitor,
            "not_improve_cnt": not_improve_cnt, "step": int(state.step),
            "include_optim": include_optim,
            "trainables_only": trainables_only}
    with open(ckpt_dir.parent / f"{ckpt_dir.name}.meta.json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(ckpt_dir: str | Path,
                    template: Optional[dict] = None) -> tuple[dict, dict]:
    """Returns (payload, meta).  ``template`` (a matching pytree of arrays)
    restores with correct dtypes/shardings when provided."""
    ckpt_dir = Path(ckpt_dir).absolute()
    ckpt = _checkpointer()
    if template is not None:
        payload = ckpt.restore(ckpt_dir, template)
    else:
        payload = ckpt.restore(ckpt_dir)
    meta_path = ckpt_dir.parent / f"{ckpt_dir.name}.meta.json"
    meta = {}
    if meta_path.exists():
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def merge_matched_params(target: dict, pretrained: dict,
                         log_fn=print) -> dict:
    """Shape-matched partial parameter merge (reference
    utils/train_util.py:219-248): pretrained leaves replace target leaves
    whose path and shape match; everything else is reported and kept."""
    flat_target = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(target)[0]}
    flat_pre = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(pretrained)[0]}
    mismatched = []
    merged = dict(flat_target)
    for key, value in flat_pre.items():
        if key in flat_target and flat_target[key].shape == value.shape:
            merged[key] = value
        else:
            mismatched.append(key)
    if mismatched:
        log_fn(f"mismatched pretrained keys (kept target): {mismatched}")
    treedef = jax.tree_util.tree_structure(target)
    paths = [jax.tree_util.keystr(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(target)[0]]
    return jax.tree_util.tree_unflatten(treedef,
                                        [merged[p] for p in paths])
