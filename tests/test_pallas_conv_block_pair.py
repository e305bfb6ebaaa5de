"""Parity-split pair kernel for block2 (interpret mode).

``ops/pallas/conv_block_pair.py`` is the round-3 kernel that finally
beats XLA at the Cin=64 geometry (7.6 ms int8 / 8.4 bf16 vs 10.2 ms XLA
at B=128, v5e) and is routed by ``ConvBlock`` for Cin=64 / Cout%128==0 /
pool (2,2) under ``TTG_FUSED_CONV``.  f32 interpret mode must match a
plain-XLA PANNs block (reference models/panns.py:20-62) bit-close —
this pins the parity-split weight packing, the pair-row edge masks, the
time zero-padding, multi-chunk staging and the pooled store; int8 must
land within dynamic-quantization noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.conv_block_pair import (
    _pick_tc_pair,
    fused_block2_pair,
)
from tests.test_pallas_conv_block_small import _case, xla_ref


@pytest.mark.parametrize("t,tc", [(20, 20), (20, 4), (12, 6)])
def test_pair_f32_exact(t, tc):
    x, w1, ab1, w2, ab2 = _case(t, 8, 64, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block2_pair(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=False, tc=tc,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pair_int8_close():
    x, w1, ab1, w2, ab2 = _case(20, 8, 64, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block2_pair(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=True, tc=10,
        interpret=True), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms


def test_pair_cout_256():
    x, w1, ab1, w2, ab2 = _case(8, 4, 64, 256)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block2_pair(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=False, tc=8,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pick_tc_pair():
    # serving geometry: T=500, mp=16 -> tc=100 ((tc+2)*mp <= 2000)
    assert _pick_tc_pair(500, 16) == 100
    with pytest.raises(ValueError):
        _pick_tc_pair(499, 16)  # prime T: no even chunk divides


def test_pick_tc_pair_vmem_bounds_long_clips():
    """The whole-clip staging grows with T; very long clips must raise
    (-> XLA fallback in ConvBlock) instead of crashing Mosaic with an
    over-budget grid step."""
    with pytest.raises(ValueError):
        _pick_tc_pair(4000, 16)         # ~16 MB of xp alone
    assert _pick_tc_pair(500, 16) == 100  # serving geometry unchanged
