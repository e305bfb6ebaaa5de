"""One typed YAML config system with inheritance + CLI overrides.

Collapses the reference's two coexisting mechanisms (custom ``type``/``args``
YAML with ``inherit_from`` merge + TOML CLI overrides, reference
utils/train_util.py:120-194, and hydra ``_target_`` instantiation, reference
utils/train_util.py:300-313) into one system with the same capabilities:

* ``inherit_from`` — relative path to a base YAML, deep-merged (child wins);
* CLI overrides — ``a.b.c=value`` strings with YAML-typed values;
* experiment-dir round-trip — the merged config is dumped to
  ``exp_dir/config.yaml`` and reloaded verbatim by evaluation.
"""

from __future__ import annotations

import copy
import os
from pathlib import Path
from typing import Any

import yaml


def merge_a_into_b(a: dict, b: dict) -> None:
    """Deep-merge ``a`` into ``b`` in place; values in ``a`` win.

    Reference: utils/train_util.py:153-161.
    """
    for k, v in a.items():
        if isinstance(v, dict) and k in b:
            if not isinstance(b[k], dict):
                raise ValueError(f"Cannot inherit key '{k}' from base!")
            merge_a_into_b(v, b[k])
        else:
            b[k] = v


def load_config(config_file: str | Path) -> dict:
    """Load YAML with recursive ``inherit_from`` resolution.

    Reference: utils/train_util.py:164-178.
    """
    config_file = Path(config_file)
    with open(config_file) as reader:
        config = yaml.safe_load(reader) or {}
    if "inherit_from" in config:
        base_file = config_file.parent / config["inherit_from"]
        if os.path.samefile(config_file, base_file):
            raise ValueError("config inherits from itself")
        base_config = load_config(base_file)
        del config["inherit_from"]
        merge_a_into_b(config, base_config)
        return base_config
    return config


def _set_dotted(cfg: dict, dotted_key: str, value: Any) -> None:
    keys = dotted_key.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        if not isinstance(node, dict):
            raise ValueError(f"override path '{dotted_key}' hits non-dict")
    node[keys[-1]] = value


def parse_overrides(overrides: list[str]) -> dict:
    """``["a.b=1", "c=foo"]`` → nested dict, values YAML-parsed."""
    out: dict = {}
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override '{item}' is not of the form key=value")
        key, raw = item.split("=", 1)
        _set_dotted(out, key.strip(), yaml.safe_load(raw))
    return out


def parse_config_or_kwargs(config_file: str | Path,
                           overrides: list[str] | None = None,
                           **kwargs) -> dict:
    """Load a config file and apply CLI/dict overrides (overrides win).

    Reference: utils/train_util.py:181-194 (TOML CLI merge replaced by
    YAML-typed ``key.path=value`` strings).  Accepts an already-loaded
    dict too (the runner ``train`` entry does; the eval entries share
    the courtesy).
    """
    if isinstance(config_file, dict):
        config = copy.deepcopy(config_file)
    else:
        config = load_config(config_file)
    if overrides:
        merge_a_into_b(parse_overrides(overrides), config)
    if kwargs:
        merge_a_into_b(copy.deepcopy(kwargs), config)
    return config


def dump_config(config: dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as writer:
        yaml.safe_dump(config, writer, sort_keys=False)
