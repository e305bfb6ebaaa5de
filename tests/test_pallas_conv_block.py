"""Fused Pallas ConvBlock kernel vs the XLA reference (interpret mode).

The kernel (ops/pallas/conv_block.py) is the serving path for the PANNs
conv trunk (reference models/panns.py:20-62); these tests pin its
numerics against a plain-XLA implementation on CPU via the Pallas
interpreter: f32 must match to float tolerance (validates the tap
indexing, mel/time edge masks, chunking and pool logic exactly), bf16
and int8 within dtype noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    _pick_tc,
    fold_bn,
    fused_double_conv_pool,
)

CASES = [
    # t, m, cin, cout, pool      (shaped like Cnn8Rnn blocks 2-4)
    (20, 32, 64, 128, (2, 2)),
    (16, 16, 128, 256, (1, 2)),
    (12, 8, 256, 512, (1, 2)),
]


def xla_ref(x, w1, ab1, w2, ab2, pool):
    def conv(x, w, a, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0)

    y = conv(x.astype(jnp.float32), w1, *ab1)
    y = conv(y, w2, *ab2)
    win = (1, pool[0], pool[1], 1)
    avg = jax.lax.reduce_window(y, 0.0, jax.lax.add, win, win, "VALID") / (
        pool[0] * pool[1])
    mx = jax.lax.reduce_window(y, -np.inf, jax.lax.max, win, win, "VALID")
    return avg + mx


def _case(t, m, cin, cout, pool, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(2, t, m, cin)).astype(np.float32)
    w1 = (rng.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, cout, cout)) * 0.05).astype(np.float32)
    ab1 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ab2 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
           jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2, pool))
    return x, w1, ab1, w2, ab2, ref


@pytest.mark.parametrize("t,m,cin,cout,pool", CASES)
def test_f32_exact(t, m, cin, cout, pool):
    """f32 interpret mode pins the kernel logic (indexing/masks/pool)."""
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x), jnp.asarray(w1), ab1, jnp.asarray(w2), ab2, pool,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t,m,cin,cout,pool", CASES)
def test_f32_exact_mel3(t, m, cin, cout, pool):
    """The mel-im2col tap mode computes the same conv."""
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x), jnp.asarray(w1), ab1, jnp.asarray(w2), ab2, pool,
        compute_dtype=jnp.float32, mel3=(True, True), interpret=True),
        np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t,m,cin,cout,pool", CASES)
@pytest.mark.parametrize("tri", [(True, True), (True, False),
                                 (False, True)])
def test_f32_exact_tri(t, m, cin, cout, pool, tri):
    """The register-built im2col (tri) mode computes the same conv."""
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x), jnp.asarray(w1), ab1, jnp.asarray(w2), ab2, pool,
        compute_dtype=jnp.float32, tri=tri, interpret=True),
        np.float32)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("tri", [(True, True), (False, True),
                                 (True, False)])
def test_int8_close_tri(tri):
    x, w1, ab1, w2, ab2, ref = _case(8, 8, 128, 128, (1, 2))
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x), jnp.asarray(w1), ab1, jnp.asarray(w2), ab2,
        (1, 2), quantize=True, tri=tri, interpret=True), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.06, rms


@pytest.mark.parametrize("t,m,cin,cout,pool", CASES[:1])
def test_multi_chunk_matches_single(t, m, cin, cout, pool):
    """Chunked execution is invisible in the output."""
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    for tc in (pool[0], t // 2, t):
        if t % tc or (t // pool[0]) % (tc // pool[0]):
            continue
        got = np.asarray(fused_double_conv_pool(
            jnp.asarray(x), jnp.asarray(w1), ab1, jnp.asarray(w2), ab2,
            pool, compute_dtype=jnp.float32, tc=tc, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"tc={tc}")


def test_bf16_close():
    t, m, cin, cout, pool = CASES[1]
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), ab1,
        jnp.asarray(w2), ab2, pool, interpret=True), np.float32)
    # two bf16 convs on random N(0, .05) weights: a few % relative
    err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
    assert err < 0.15, err


@pytest.mark.parametrize("mel3", [(False, False), (True, True)])
def test_int8_close(mel3):
    t, m, cin, cout, pool = CASES[1]
    x, w1, ab1, w2, ab2, ref = _case(t, m, cin, cout, pool)
    got = np.asarray(fused_double_conv_pool(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), ab1,
        jnp.asarray(w2), ab2, pool, quantize=True, mel3=mel3,
        interpret=True), np.float32)
    # int8 on random uncorrelated weights is the worst case; real-model
    # parity is pinned end-to-end in test_encoder_parity
    err = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert err < 0.05, err


def test_int8_mixed_mel3_rejected():
    """quantize + mel3=(False, True) would store unscaled floats into an
    int8 y1 scratch — the API must reject it, not emit garbage."""
    t, m, cin, cout, pool = CASES[1]
    x, w1, ab1, w2, ab2, _ = _case(t, m, cin, cout, pool)
    with pytest.raises(ValueError, match="mel3"):
        fused_double_conv_pool(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), ab1,
            jnp.asarray(w2), ab2, pool, quantize=True,
            mel3=(False, True), interpret=True)


def test_pick_tc_cnn8rnn_blocks():
    """The heuristic picks the empirically-validated chunk sizes for the
    10 s serving shapes (T=1001 -> blocks at T=500/250)."""
    assert _pick_tc(500, 32, 64, 128, 2, 2, False, jnp.bfloat16) in (50, 100)
    assert _pick_tc(250, 16, 128, 256, 1, 2, False, jnp.bfloat16) == 125
    assert _pick_tc(250, 16, 128, 256, 1, 2, True, jnp.bfloat16) == 125
    tc4 = _pick_tc(250, 8, 256, 512, 1, 2, True, jnp.bfloat16)
    assert tc4 in (50, 250) and tc4 * 8 <= 2000


def test_fold_bn():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 2, 8).astype(np.float32)
    bias = rng.normal(size=8).astype(np.float32)
    mean = rng.normal(size=8).astype(np.float32)
    var = rng.uniform(0.1, 2, 8).astype(np.float32)
    a, b = fold_bn(jnp.asarray(scale), jnp.asarray(bias),
                   jnp.asarray(mean), jnp.asarray(var))
    want = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(x * np.asarray(a) + np.asarray(b), want,
                               rtol=1e-5)
