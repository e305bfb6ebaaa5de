"""Fused block1 pair kernel parity (interpret mode).

``ops/pallas/conv_block1_pair.py`` is the round-4 Cin=1 kernel: conv1
as 2 banded K=128 dots (time-pair lane packing), conv2 as 3 K=384 dots
over a register-resident triple-stored r-major scratch, in-register
dual pool emitting block2's packed lane order.  f32 interpret mode must
match a plain-XLA PANNs block (reference models/panns.py:20-62 as
block1 of models/audio_encoder.py:96-118) bit-close — this pins the
banded weight construction, the time/mel zero-padding, the halo
overcompute discard, multi-chunk staging and the packed pooled store;
int8 must land within dynamic-quantization noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.conv_block1_pair import (
    fused_block1_pair,
)
from tests.test_pallas_conv_block_small import _case, xla_ref


def _case1(t, seed=0):
    x, w1, ab1, w2, ab2 = _case(t, 64, 1, 64, seed=seed)
    return x, w1, ab1, w2, ab2


@pytest.mark.parametrize("t", [32, 37, 96])
def test_block1_f32_exact(t):
    # t=37: odd + padded to the tc=16 chunk grid (the serving T=1001
    # case); t=96: multi-chunk
    x, w1, ab1, w2, ab2 = _case1(t)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=False,
        tc=16, compute_dtype=jnp.float32, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_block1_int8_close():
    x, w1, ab1, w2, ab2 = _case1(37)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=True,
        tc=16, interpret=True), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms


@pytest.mark.parametrize("t", [32, 37, 96])
def test_block1_single_mode_f32_exact(t):
    # round-5 single-store variant: same math through a once-stored
    # halo layout + three global-row-offset K=4C dots
    x, w1, ab1, w2, ab2 = _case1(t)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=False,
        tc=16, compute_dtype=jnp.float32, interpret=True,
        mode="single"), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_block1_single_mode_int8_close():
    x, w1, ab1, w2, ab2 = _case1(37)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=True,
        tc=16, interpret=True, mode="single"), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms


def test_block1_bf16_close():
    # the TTG_B1_QUANT=0 serving path (bf16 compute, bf16 pool chain):
    # round-5 on-chip A/B measured it faster than int8 at block1's
    # geometry (the int8 quantize epilogue costs more than the int8
    # dot-rate gain) — this pins its numerics within bf16 noise
    x, w1, ab1, w2, ab2 = _case1(37)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=False,
        tc=16, compute_dtype=jnp.bfloat16, interpret=True), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.02, rms


@pytest.mark.parametrize("mode", ["triple", "single"])
def test_block1_mixed_quant_close(mode):
    # quantize="conv1" (TTG_B1_QUANT=mixed): int8 conv1 dot feeding a
    # compute-dtype conv2, no y1 requantize — numerics must sit between
    # the bf16 and all-int8 paths (only x and w1 are quantized)
    x, w1, ab1, w2, ab2 = _case1(37)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize="conv1",
        tc=16, compute_dtype=jnp.float32, interpret=True, mode=mode),
        np.float32)
    assert got.shape == ref.shape
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.03, rms


def test_block1_truthy_int_quantize_is_all_int8():
    # review regression: quantize=1 (truthy int) must normalize to the
    # historical bool contract (all-int8), not silently route to mixed
    x, w1, ab1, w2, ab2 = _case1(32)
    a = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=1,
        tc=16, interpret=True), np.float32)
    b = np.asarray(fused_block1_pair(
        jnp.asarray(x[..., 0]), w1, ab1, w2, ab2, quantize=True,
        tc=16, interpret=True), np.float32)
    np.testing.assert_array_equal(a, b)
    with pytest.raises(ValueError):
        fused_block1_pair(jnp.asarray(x[..., 0]), w1, ab1, w2, ab2,
                          quantize="both", tc=16, interpret=True)


def test_block1_rejects_bad_geometry():
    x, w1, ab1, w2, ab2 = _case1(32)
    with pytest.raises(ValueError):
        fused_block1_pair(jnp.asarray(x[..., 0, :32]), w1, ab1, w2, ab2,
                          tc=16, interpret=True)
    with pytest.raises(ValueError):
        fused_block1_pair(jnp.asarray(x[..., 0]), w1, ab1, w2, ab2,
                          tc=10, interpret=True)
