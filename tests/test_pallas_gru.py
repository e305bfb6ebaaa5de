"""Pallas scan-fused BiGRU recurrence (interpret mode).

``ops/pallas/gru.py`` is the SURVEY §7 "GRU scan fusion" target: the
serving-path recurrence with weights and carries VMEM-resident across a
sequential grid walk.  Interpret-mode CI pins it bit-close against the
grouped ``lax.scan`` BiGRU (models/layers.py), both standalone and via
the ``TTG_PALLAS_GRU=1`` routing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.models.layers import BiGRU
from texttoaudiogrounding_tpu.ops.pallas.gru import bigru_pallas


def _params_and_input(b=4, t=10, d=12, h=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, d)) * 0.3, jnp.float32)
    model = BiGRU(h)
    variables = model.init(jax.random.PRNGKey(1), x)
    return model, variables, x, (b, t, d, h)


def test_bigru_pallas_matches_scan():
    model, variables, x, (b, t, d, h) = _params_and_input()
    ref = model.apply(variables, x)

    p = variables["params"]

    def packed(g):
        cell = p[f"GRUCell_{g}"]
        wi = jnp.concatenate([cell["ir"]["kernel"], cell["iz"]["kernel"],
                              cell["in"]["kernel"]], 1)
        bi = jnp.concatenate([cell["ir"]["bias"], cell["iz"]["bias"],
                              cell["in"]["bias"]])
        wh = jnp.concatenate([cell["hr"]["kernel"], cell["hz"]["kernel"],
                              cell["hn"]["kernel"]], 1)
        return wi, bi, wh, cell["hn"]["bias"]

    wi0, bi0, wh0, bn0 = packed(0)
    wi1, bi1, wh1, bn1 = packed(1)
    xg = jnp.stack([x, jnp.flip(x, 1)])
    wi = jnp.stack([wi0, wi1])
    bi = jnp.stack([bi0, bi1])
    tproj = jnp.einsum("gbtd,gdh->tgbh", xg, wi) + bi[None, :, None]
    ys = bigru_pallas(tproj.reshape(t, 2 * b, 3 * h),
                      jnp.stack([wh0, wh1]), jnp.stack([bn0, bn1]),
                      interpret=True)
    ys = jnp.moveaxis(ys.reshape(t, 2, b, h), 0, 2)
    got = jnp.concatenate([ys[0], jnp.flip(ys[1], 1)], -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_bigru_env_routing(monkeypatch):
    """TTG_PALLAS_GRU=1 routes BiGRU through the kernel (interpret on
    CPU via pallas_supported? no — CPU has no Mosaic, so the routing
    must quietly stay on the scan path there)."""
    model, variables, x, _ = _params_and_input(seed=3)
    ref = model.apply(variables, x)
    monkeypatch.setenv("TTG_PALLAS_GRU", "1")
    got = model.apply(variables, x)   # pallas_supported() False on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=0)


def test_bigru_pallas_custom_vjp_grads():
    """Gradients of the Pallas recurrence (custom VJP, backward kernel
    walking the grid reversed) match jax.grad of the scan BiGRU for
    proj, wh and bn."""
    from texttoaudiogrounding_tpu.ops.pallas.gru import (
        bigru_pallas_trainable,
    )

    rng = np.random.default_rng(5)
    b, t, h = 3, 7, 8
    proj = jnp.asarray(rng.normal(size=(t, 2 * b, 3 * h)) * 0.5,
                       jnp.float32)
    wh = jnp.asarray(rng.normal(size=(2, h, 3 * h)) * 0.4, jnp.float32)
    bn = jnp.asarray(rng.normal(size=(2, h)) * 0.2, jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(t, 2 * b, h)), jnp.float32)

    def scan_ref(proj, wh, bn):
        def step(hid, pp):                       # hid [2B, H]
            rzn = jnp.concatenate(
                [hid[:b] @ wh[0], hid[b:] @ wh[1]], 0)
            r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
            z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
            bns = jnp.concatenate([jnp.tile(bn[0], (b, 1)),
                                   jnp.tile(bn[1], (b, 1))], 0)
            n = jnp.tanh(pp[:, 2 * h:] + r * (rzn[:, 2 * h:] + bns))
            hid = (1 - z) * n + z * hid
            return hid, hid

        _, ys = jax.lax.scan(step, jnp.zeros((2 * b, h)), proj)
        return ys

    def loss(fn):
        return lambda p, w, c: jnp.sum(fn(p, w, c) * g_out)

    ref_val = loss(scan_ref)(proj, wh, bn)
    got_val = loss(lambda p, w, c: bigru_pallas_trainable(
        p, w, c, interpret=True))(proj, wh, bn)
    np.testing.assert_allclose(float(got_val), float(ref_val),
                               rtol=1e-5)

    ref_grads = jax.grad(loss(scan_ref), argnums=(0, 1, 2))(proj, wh, bn)
    got_grads = jax.grad(loss(lambda p, w, c: bigru_pallas_trainable(
        p, w, c, interpret=True)), argnums=(0, 1, 2))(proj, wh, bn)
    for name, rg, gg in zip(("proj", "wh", "bn"), ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=2e-4, atol=2e-5, err_msg=name)

    # round-4 backward redesign (dWh/dbn via the post-walk einsum)
    from texttoaudiogrounding_tpu.ops.pallas.gru import (
        bigru_pallas_trainable_v2,
    )
    v2_grads = jax.grad(loss(lambda p, w, c: bigru_pallas_trainable_v2(
        p, w, c, interpret=True)), argnums=(0, 1, 2))(proj, wh, bn)
    for name, rg, gg in zip(("proj", "wh", "bn"), ref_grads, v2_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bigru_pallas_bf16_trainable_grads():
    """bf16-recurrence trainable variant: value matches the bf16 scan
    (the serving recurrence), gradients match jax.grad of the f32 scan
    at bf16 tolerance — the carry/accumulators are f32, so only operand
    rounding separates them."""
    from texttoaudiogrounding_tpu.ops.pallas.gru import (
        bigru_pallas_trainable_bf16,
    )

    rng = np.random.default_rng(11)
    b, t, h = 3, 7, 8
    proj = jnp.asarray(rng.normal(size=(t, 2 * b, 3 * h)) * 0.5,
                       jnp.float32)
    wh = jnp.asarray(rng.normal(size=(2, h, 3 * h)) * 0.4, jnp.float32)
    bn = jnp.asarray(rng.normal(size=(2, h)) * 0.2, jnp.float32)
    g_out = jnp.asarray(rng.normal(size=(t, 2 * b, h)), jnp.float32)

    def scan_ref(proj, wh, bn, dtype):
        def step(hid, pp):                       # hid [2B, H] dtype
            whd = wh.astype(dtype)
            rzn = jnp.concatenate(
                [(hid[:b] @ whd[0]).astype(jnp.float32),
                 (hid[b:] @ whd[1]).astype(jnp.float32)], 0)
            r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
            z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
            bns = jnp.concatenate([jnp.tile(bn[0], (b, 1)),
                                   jnp.tile(bn[1], (b, 1))], 0)
            n = jnp.tanh(pp[:, 2 * h:] + r * (rzn[:, 2 * h:] + bns))
            hid = (1 - z) * n + z * hid.astype(jnp.float32)
            return hid.astype(dtype), hid

        _, ys = jax.lax.scan(step, jnp.zeros((2 * b, h), dtype), proj)
        return ys

    def loss(fn):
        return lambda p, w, c: jnp.sum(fn(p, w, c) * g_out)

    # forward: EXACTLY the bf16 scan (the serving recurrence numerics)
    ref16 = scan_ref(proj, wh, bn, jnp.bfloat16)
    got = bigru_pallas_trainable_bf16(proj, wh, bn, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref16),
                               rtol=1e-6, atol=1e-6)

    # gradients: close to the f32 scan's at bf16-operand tolerance
    ref_grads = jax.grad(
        loss(lambda p, w, c: scan_ref(p, w, c, jnp.float32)),
        argnums=(0, 1, 2))(proj, wh, bn)
    got_grads = jax.grad(loss(lambda p, w, c: bigru_pallas_trainable_bf16(
        p, w, c, interpret=True)), argnums=(0, 1, 2))(proj, wh, bn)
    for name, rg, gg in zip(("proj", "wh", "bn"), ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                   rtol=0.08, atol=0.05, err_msg=name)
