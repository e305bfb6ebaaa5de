"""Fused train-BN -> relu -> dual-pool custom VJP parity (interpret).

The op must match ``BatchNorm(train) -> relu -> avg_pool + max_pool``
— forward, the FULL gradient set (x, scale, bias; including the
batch-stat backward paths), and the batch mean/var fed to the running
stats — at the block1 packed layout and the generic C >= 128 layouts.
Reference semantics: models/panns.py:37-57, audio_encoder.py:202-211.
"""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from texttoaudiogrounding_tpu.models.layers import ConvBlock
from texttoaudiogrounding_tpu.ops.pallas.bn_pool import bn_relu_dual_pool


def ref_chain(x, scale, bias, pool, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean((0, 1, 2))
    var = jnp.maximum((xf * xf).mean((0, 1, 2)) - mean * mean, 0.0)
    h = nn.relu((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias)
    return (nn.avg_pool(h, pool, strides=pool)
            + nn.max_pool(h, pool, strides=pool)).astype(x.dtype)


@pytest.mark.parametrize("t,m,c,pool", [
    (8, 64, 64, (2, 2)),     # block1 packed lane layout
    (9, 64, 64, (2, 2)),     # block1 packed, odd T (floor pooling)
    (8, 8, 128, (2, 2)),     # block2-like
    (8, 4, 256, (1, 2)),     # block3-like
    (8, 8, 512, (1, 2)),     # block4-like flat 3-D bwd layout
    (16, 8, 128, (2, 2)),    # multi-chunk (tc=8)
])
def test_bn_pool_grad_parity(t, m, c, pool):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, t, m, c)).astype(np.float32)
    x[:, :2] = np.round(x[:, :2] * 2) / 2      # force max-pool ties
    x = jnp.asarray(x)
    scale = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.5 + 1.0)
    bias = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
    tc = 8 if t == 16 else None

    ref, ref_vjp = jax.vjp(
        lambda v, s, b: ref_chain(v, s, b, pool), x, scale, bias)

    def mine(v, s, b):
        out, _, _ = bn_relu_dual_pool(v, s, b, pool=pool, tc=tc,
                                      interpret=True)
        return out

    got, got_vjp = jax.vjp(mine, x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    for mg, rg in zip(got_vjp(g), ref_vjp(g)):
        np.testing.assert_allclose(np.asarray(mg), np.asarray(rg),
                                   rtol=2e-4, atol=2e-4)


def test_bn_pool_stats_outputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)).astype(np.float32))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    _, mean, var = bn_relu_dual_pool(x, scale, bias, pool=(2, 2),
                                     interpret=True)
    xf = np.asarray(x, np.float64)
    np.testing.assert_allclose(np.asarray(mean),
                               xf.mean((0, 1, 2)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var),
                               xf.var((0, 1, 2)), rtol=1e-4, atol=1e-5)


def test_bn_pool_bf16():
    rng = np.random.default_rng(2)
    xf = rng.normal(size=(2, 8, 64, 64)).astype(np.float32)
    x = jnp.asarray(xf, jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    ref = ref_chain(jnp.asarray(x, jnp.float32), scale, bias, (2, 2))
    got, _, _ = bn_relu_dual_pool(x, scale, bias, pool=(2, 2),
                                  interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t,m,cin,cout,pool", [
    (12, 64, 1, 64, (2, 2)),      # block1 geometry
    (8, 8, 64, 128, (2, 2)),      # block2 geometry
    (8, 4, 128, 256, (1, 2)),     # block3 geometry
])
def test_convblock_bn_pool_routing(t, m, cin, cout, pool, monkeypatch):
    """ConvBlock under TTG_BN_POOL: loss, grads AND running-stat
    updates match the plain flax path (train mode)."""
    monkeypatch.setenv("TTG_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, t, m, cin)).astype(np.float32))
    model = ConvBlock(cout)
    v = model.init(jax.random.PRNGKey(1), x, bn_train=False)

    def run(flag):
        if flag:
            monkeypatch.setenv("TTG_BN_POOL", str(cout))
        else:
            monkeypatch.delenv("TTG_BN_POOL", raising=False)

        def loss(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, bn_train=True, pool_size=pool,
                mutable=["batch_stats"])
            return jnp.sum(out ** 2) * 1e-3, upd

        (l, upd), g = jax.value_and_grad(loss, has_aux=True)(v["params"])
        return l, upd, g

    l0, upd0, g0 = run(False)
    l1, upd1, g1 = run(True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        upd1, upd0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4),
        g1, g0)
