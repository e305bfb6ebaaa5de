from texttoaudiogrounding_tpu.utils.config import (
    load_config,
    merge_a_into_b,
    parse_config_or_kwargs,
    parse_overrides,
)
from texttoaudiogrounding_tpu.utils.registry import (
    get_registry,
    instantiate,
    register,
    resolve,
)

__all__ = [
    "load_config",
    "merge_a_into_b",
    "parse_config_or_kwargs",
    "parse_overrides",
    "get_registry",
    "instantiate",
    "register",
    "resolve",
]
