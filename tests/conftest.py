"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware via
``xla_force_host_platform_device_count`` (the fake-backend analog of the
reference's absent multi-device test story, see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
# (real TPU); the env var alone is therefore too late — force via config.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall time is dominated
# by recompiling the same runner-E2E graphs (~90 s each) on every run;
# with the cache warm the full suite drops from ~35 min to minutes.
# Keys hash the optimized HLO, so source changes recompile as usual.
# Opt out with TTG_TEST_NO_COMPILE_CACHE=1 (e.g. to time cold compiles).
if not os.environ.get("TTG_TEST_NO_COMPILE_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                              ".cache", "jax")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
