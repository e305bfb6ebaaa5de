"""Pair-dense fused kernels for Cnn8Rnn blocks 1-2 (interpret mode).

These kernels (ops/pallas/conv_block_small.py) are the round-3
experiments against the blocks-1-2 frontier: f32 interpret mode must
match a plain-XLA PANNs block bit-close (pins pair-packing, parity
windows, banded weights, edge masks, chunking and the floor pool);
int8 within dynamic-quantization noise.  On-chip they measure ~XLA
parity, so they are NOT routed by default — see STATUS.md for the
measurement table that justifies that call.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.conv_block_small import (
    fused_block1,
    fused_block2,
)


def xla_ref(x, w1, ab1, w2, ab2, pool=(2, 2)):
    def conv(x, w, a, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0)

    y = conv(x.astype(jnp.float32), w1, *ab1)
    y = conv(y, w2, *ab2)
    win = (1, pool[0], pool[1], 1)
    t2 = y.shape[1] // pool[0] * pool[0]  # torch floor pooling
    y = y[:, :t2]
    avg = jax.lax.reduce_window(y, 0.0, jax.lax.add, win, win,
                                "VALID") / (pool[0] * pool[1])
    mx = jax.lax.reduce_window(y, -np.inf, jax.lax.max, win, win, "VALID")
    return avg + mx


def _case(t, m, cin, cout, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, t, m, cin)).astype(np.float32)
    w1 = (rng.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, cout, cout)) * 0.05).astype(np.float32)
    ab1 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ab2 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    return x, w1, ab1, w2, ab2


@pytest.mark.parametrize("t", [20, 19])
@pytest.mark.parametrize("conv1", ["banded", "windows"])
def test_block2_f32_exact(t, conv1):
    x, w1, ab1, w2, ab2 = _case(t, 8, 64, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block2(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=False, tc=10,
        compute_dtype=jnp.float32, conv1=conv1, interpret=True),
        np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_block2_int8_close():
    x, w1, ab1, w2, ab2 = _case(20, 8, 64, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block2(jnp.asarray(x), w1, ab1, w2, ab2,
                                  quantize=True, tc=10, interpret=True),
                     np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms


@pytest.mark.parametrize("t", [21, 20])
def test_block1_f32_exact(t):
    rng = np.random.default_rng(1)
    m, cout = 16, 64
    xm = rng.normal(size=(2, t, m)).astype(np.float32)
    w1 = (rng.normal(size=(3, 3, 1, cout)) * 0.3).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, cout, cout)) * 0.05).astype(np.float32)
    ab1 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ab2 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ref = np.asarray(xla_ref(jnp.asarray(xm)[..., None], jnp.asarray(w1),
                             ab1, jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1(
        jnp.asarray(xm), w1, ab1, w2, ab2, quantize=False, tc=4,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_block1_int8_close():
    rng = np.random.default_rng(2)
    t, m, cout = 21, 16, 64
    xm = rng.normal(size=(2, t, m)).astype(np.float32)
    w1 = (rng.normal(size=(3, 3, 1, cout)) * 0.3).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, cout, cout)) * 0.05).astype(np.float32)
    ab1 = (jnp.asarray(np.ones(cout), jnp.float32),
           jnp.asarray(np.zeros(cout), jnp.float32))
    ab2 = ab1
    ref = np.asarray(xla_ref(jnp.asarray(xm)[..., None], jnp.asarray(w1),
                             ab1, jnp.asarray(w2), ab2))
    got = np.asarray(fused_block1(jnp.asarray(xm), w1, ab1, w2, ab2,
                                  quantize=True, tc=4, interpret=True),
                     np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms
