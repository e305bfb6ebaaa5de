"""Component registry: config names → builders.

Preserves the reference's "everything swappable from YAML" property
(encoders, match fns, poolings, losses, datasets, samplers are all named in
configs and instantiated reflectively — reference utils/train_util.py:128-137
and the hydra path :300-313) with one mechanism:

* ``@register("Cnn8Rnn")`` adds a class/factory under a short name;
* ``resolve(name)`` looks up short names first, then dotted import paths;
* ``instantiate(cfg)`` builds ``{"type": name, "args": {...}}`` trees,
  recursively building nested component dicts (sub-model keys outside
  ``type``/``args`` like the reference, or ``type``-tagged dicts inside
  ``args``).  ``{"_target_": ...}`` style is accepted as an alias.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str | None = None):
    """Class/function decorator adding the object to the registry."""

    def wrap(obj):
        key = name or obj.__name__
        if key in _REGISTRY and _REGISTRY[key] is not obj:
            raise KeyError(f"duplicate registry name: {key}")
        _REGISTRY[key] = obj
        return obj

    return wrap


def get_registry() -> dict[str, Callable]:
    return dict(_REGISTRY)


def resolve(name: str) -> Callable:
    """Short registry name, dotted import path, or a reference-style
    dotted name whose last component is registered (so the reference's
    YAML configs — e.g. ``models.audio_encoder.Cnn8_Rnn`` — resolve to
    our equivalents verbatim)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if "." in name:
        module, cls = name.rsplit(".", 1)
        try:
            return getattr(importlib.import_module(module), cls)
        except (ImportError, AttributeError):
            if cls in _REGISTRY:
                return _REGISTRY[cls]
            raise
    raise KeyError(
        f"'{name}' not registered; known: {sorted(_REGISTRY)[:40]}...")


def _is_component_cfg(value: Any) -> bool:
    return isinstance(value, dict) and ("type" in value or "_target_" in value)


def instantiate(config: dict, **kwargs) -> Any:
    """Build an object from a ``type``/``args`` (or ``_target_``) dict.

    Mirrors reference ``init_obj_from_str`` (utils/train_util.py:128-137):
    keys outside ``type``/``args`` that are dicts become recursively-built
    keyword arguments; explicit ``kwargs`` win.  Additionally, ``type``-tagged
    dicts *inside* ``args`` are built too (covers the hydra-style nesting the
    reference used for dataloaders/optimizers).
    """
    name = config.get("type") or config.get("_target_")
    if name is None:
        raise ValueError(f"component config missing 'type': {config}")
    obj_args: dict = {}
    for key, value in config.get("args", {}).items():
        if key == "dtype" and isinstance(value, str):
            # YAML-friendly mixed precision: dtype: bfloat16 etc.
            import jax.numpy as jnp
            value = jnp.dtype(value).type
        obj_args[key] = instantiate(value) if _is_component_cfg(value) else value
    # hydra-style: everything at top level except the tag is an arg
    if "args" not in config and "_target_" in config:
        for key, value in config.items():
            if key == "_target_":
                continue
            obj_args[key] = (instantiate(value)
                             if _is_component_cfg(value) else value)
    for key, value in config.items():
        if key in ("type", "_target_", "args") or key in kwargs:
            continue
        if isinstance(value, dict):
            obj_args[key] = instantiate(value)
    obj_args.update(kwargs)
    return resolve(name)(**obj_args)
