"""Winograd F(2x2, 3x3) fused block kernel (interpret mode).

``ops/pallas/conv_block_wino.py`` reformulates the compute-bound
Cin >= 128 blocks as 16 pointwise products (2.25x MAC cut, exact math).
CI pins (a) the Winograd math itself against ``lax.conv``, (b) the full
fused kernel's f32 plane pipeline against the plain-XLA PANNs block
(incl. odd T, multi-chunk staging, mel-edge masks), and (c) the int8
per-k dynamic-quantization path within noise tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.conv_block_wino import (
    _pick_tpad_tc,
    fused_block_wino,
    winograd_conv3x3,
)
from tests.test_pallas_conv_block_small import _case, xla_ref


def test_winograd_math_matches_lax_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = winograd_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("t,m,tc", [(20, 8, 20), (20, 8, 4), (12, 16, 6),
                                    (19, 8, 4)])
def test_wino_f32_exact(t, m, tc):
    x, w1, ab1, w2, ab2 = _case(t, m, 128, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block_wino(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=False, tc=tc,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_wino_cout_expand():
    """Cin != Cout (the block3/4 expanding convs)."""
    x, w1, ab1, w2, ab2 = _case(8, 8, 128, 256)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block_wino(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=False, tc=8,
        compute_dtype=jnp.float32, interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_wino_int8_close():
    x, w1, ab1, w2, ab2 = _case(20, 8, 128, 128)
    ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                             jnp.asarray(w2), ab2))
    got = np.asarray(fused_block_wino(
        jnp.asarray(x), w1, ab1, w2, ab2, quantize=True, tc=10,
        interpret=True), np.float32)
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref ** 2))
    assert rms < 0.05, rms


def test_pick_tpad_tc():
    from texttoaudiogrounding_tpu.ops.pallas.conv_block_wino import (
        _wino_vmem_bytes,
    )

    # block3 serving geometry (int8): T=250, M=16, 128 -> 256
    tpad, tc = _pick_tpad_tc(250, 16, 128, 256, True, jnp.bfloat16)
    assert tpad == 250 and 250 % tc == 0
    assert _wino_vmem_bytes(tc, tpad, 16, 128, 256, True,
                            jnp.bfloat16) <= 13 * 2 ** 20
    # block4 (int8): T=125 (odd) -> padded even; the working set of a
    # whole-clip chunk would blow VMEM, so the pick must stay bounded
    tpad, tc = _pick_tpad_tc(125, 8, 256, 512, True, jnp.bfloat16)
    assert tpad % 2 == 0 and tpad >= 126 and tpad % tc == 0
    assert _wino_vmem_bytes(tc, tpad, 8, 256, 512, True,
                            jnp.bfloat16) <= 13 * 2 ** 20
    # bf16 block4 weights alone need ~12.6 MB -> no valid chunk
    with pytest.raises(ValueError):
        _pick_tpad_tc(125, 8, 256, 512, False, jnp.bfloat16)
