"""relu -> dual-pool Pallas custom-VJP parity (interpret mode).

Forward must bit-match ``avg_pool(relu(x)) + max_pool(relu(x))``
(stride == window, torch floor pooling) and the gradient must match
XLA's reduce_window/SelectAndScatter VJP — including first-argmax tie
routing (exercised with duplicated values) and relu(0) zero-grad.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.ops.pallas.dual_pool import dual_pool_relu


def xla_pool(x, pool):
    h = nn.relu(x)
    return (nn.avg_pool(h, pool, strides=pool)
            + nn.max_pool(h, pool, strides=pool))


@pytest.mark.parametrize("t,m,c,pool", [
    (8, 8, 128, (2, 2)),
    (9, 8, 128, (2, 2)),     # odd T: floor pooling, zero grad on tail
    (8, 4, 256, (1, 2)),
    (8, 8, 512, (1, 2)),     # block4-like flat 3-D bwd layout
    (16, 8, 128, (2, 2)),    # multi-chunk (tc=8)
    (8, 64, 64, (2, 2)),     # block1 packed lane layout
    (9, 64, 64, (2, 2)),     # block1 packed, odd T
])
def test_dual_pool_grad_parity(t, m, c, pool):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, t, m, c)).astype(np.float32)
    # force ties and exact zeros so the routing semantics are exercised
    x[:, :2] = np.round(x[:, :2] * 2) / 2
    x[0, 0, 0, :] = 0.0
    x = jnp.asarray(x)
    tc = 8 if t == 16 else None

    ref, ref_vjp = jax.vjp(lambda v: xla_pool(v, pool), x)
    got, got_vjp = jax.vjp(
        lambda v: dual_pool_relu(v, pool, tc, True), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    np.testing.assert_allclose(np.asarray(got_vjp(g)[0]),
                               np.asarray(ref_vjp(g)[0]),
                               rtol=1e-5, atol=1e-5)


def test_dual_pool_bf16():
    # kernel accumulates in f32 then rounds once; compare against the
    # f32 reference rounded to bf16 (1-ulp tolerance for the avg sum)
    rng = np.random.default_rng(1)
    xf = rng.normal(size=(2, 8, 8, 128)).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    ref = xla_pool(jnp.asarray(x, jnp.float32), (2, 2))
    got = dual_pool_relu(x, (2, 2), None, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)
