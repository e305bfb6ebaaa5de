"""Fused train-mode BatchNorm -> ReLU -> dual (avg+max) pool custom VJP.

Motivation (round-5 bisect, scripts/probe_block1_bwd.py on-chip): of
block1's 46.6 ms standalone fwd+bwd at B=128, the conv dots are 21.7
(at their 3x-FLOP SOL) while the dual pool carries ~17 ms, train-BN
stat grads ~8 and the BN+relu elementwise ~5 — XLA's
SelectAndScatter max-pool backward plus the separate BN stat/apply
passes are the 3x-over-SOL slack named by the round-4 verdict
(VERDICT.md item 1).  The round-4 relu+pool-only kernel
(``dual_pool.py``) LOST in-chain at blocks 2-4 because XLA fuses
BN+relu+pool into the surrounding convs; this module moves the WHOLE
BN(train)+relu+pool segment behind one custom-VJP boundary so there is
nothing left for XLA to fuse across it:

  forward   = one stats reduction (plain XLA, GSPMD-correct) + ONE
              Pallas pass: affine+relu+pool (reads x once, writes the
              pooled quarter)
  backward  = ONE Pallas pass reading (x, g): recomputes the
              normalized field, routes the avg+max window gradients
              (torch first-argmax ties, zero grad at relu(0)), writes
              ``ac*dz`` and per-chunk stat-grad partials (sum dz,
              sum dz*n); then one fused XLA elementwise applies the
              two per-channel BN correction terms.

Semantics match ``BN(train, momentum, eps) -> relu -> avg_pool +
max_pool`` (stride == window, floor pooling) with flax's f32
fast-variance statistics; the full train-BN backward (including the
batch-stat paths) is implemented in closed form:

  dx = ac*dz - ac*mean(dz) - n * ac*mean(dz*n),   ac = gamma*rsqrt(var+eps)
  dgamma = sum(dz*n),  dbeta = sum(dz)

Reference semantics: models/panns.py:37-57 (conv block BN/relu/pool),
models/audio_encoder.py:202-211 (train-mode batch stats).

**Measured closure verdict (2026-08-20, chip_playbook_r5b on v5e,
B=128)**: LOSES in-chain and at step level — block1 chain fwd+bwd
50.0 ms vs 46.5 XLA (round-4 poolvjp: 57.8); full bf16 train step
153.3 ms (block1 only) / 170.8 (all blocks) vs 140.0-140.4 default.
Convergence under the kernel is trajectory-equal (ab_gru_convergence),
so the loss is pure throughput: XLA's conv-fused BN/relu/pool forward
AND backward remain the fastest known training form on v5e, even
against a single-pass custom VJP with closed-form BN grads.  The
kernel stays as a parity-tested opt-in (``TTG_BN_POOL``); do NOT
route it by default.

Layouts reuse ``dual_pool.py``'s (same pickers, same free reshapes):
packed block1 (M == C == 64, pool (2,2), lane = (m parity)*64 + c) and
the generic C >= 128 paths for pool (2,2) / (1,2).  The backward
derives every window element from ONE reshaped value (the normalized
field n) — z, relu mask and the s2 partial all come from slices of it,
respecting the one-reshape Mosaic pitfall pinned in
scripts/probe_dual_pool_micro.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.dual_pool import (
    _is_packed, _pick_tc)

__all__ = ["bn_relu_dual_pool"]


def _row_broadcast(s1, s2, lanes):
    """[16, lanes] partial block: rows 0-7 = s1, rows 8-15 = s2."""
    ridx = jax.lax.broadcasted_iota(jnp.int32, (16, lanes), 0)
    return jnp.where(ridx < 8, s1[None, :], s2[None, :])


def _route_window_grads(elems_n, gam, bet, g, inv_count):
    """Per-window-element dz (grad wrt the pre-relu affine output z).

    ``elems_n`` are slices of the ONE reshaped normalized field n;
    h = relu(gamma*n + beta) is derived per slice (never a second
    reshape — the Mosaic one-reshape pitfall).  Torch semantics:
    first-argmax max routing in window order, zero grad at relu(0).
    """
    hs = [jnp.maximum(e * gm + bt, 0.0)
          for e, gm, bt in zip(elems_n, gam, bet)]
    mx = hs[0]
    for h in hs[1:]:
        mx = jnp.maximum(mx, h)
    gavg = g * inv_count
    taken = jnp.zeros_like(mx, dtype=jnp.bool_)
    dzs = []
    for h in hs:
        hit = (h == mx) & ~taken
        taken = taken | hit
        d = gavg + jnp.where(hit, g, 0.0)
        dzs.append(jnp.where(h > 0, d, 0.0))
    return dzs


# ---------------------------------------------------------------- forward

def _fwd_kernel(x_ref, ab_ref, out_ref, *, tc, m, c, pt):
    from texttoaudiogrounding_tpu.ops.pallas.conv_block import _dual_pool

    sc = ab_ref[0, 0:1]                       # [1, c] scale_eff
    sh = ab_ref[0, 1:2]                       # [1, c] shift_eff
    h = jnp.maximum(x_ref[0].astype(jnp.float32) * sc + sh, 0.0)
    out_ref[0] = _dual_pool(h, tc, m, c, pt, 2).astype(out_ref.dtype)


def _fwd_kernel_packed(x_ref, ab_ref, out_ref, *, tc):
    sc = ab_ref[0, 0:1]                       # [1, 128] packed
    sh = ab_ref[0, 1:2]
    h = jnp.maximum(x_ref[0].astype(jnp.float32) * sc + sh, 0.0)
    v = h.reshape(tc // 2, 64, 128)
    te, to = v[:, :32], v[:, 32:]             # t even / odd rows
    s = (te + to).reshape(tc // 2 * 32, 128)
    mx = jnp.maximum(te, to).reshape(tc // 2 * 32, 128)
    sm = s[:, :64] + s[:, 64:]
    mm = jnp.maximum(mx[:, :64], mx[:, 64:])
    out_ref[0] = (sm * 0.25 + mm).astype(out_ref.dtype)


def _run_fwd(x4, ab, pt, tc, interpret, packed):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    m2 = m // 2
    if packed:
        xf = x4.reshape(b, t * 32, 128)
        kern = functools.partial(_fwd_kernel_packed, tc=tc)
        rows_in, rows_out, cw = tc * 32, (tc // 2) * 32, 64
        out_rows, lanes = (t // 2) * 32, 128
    else:
        xf = x4.reshape(b, t * m, c)
        kern = functools.partial(_fwd_kernel, tc=tc, m=m, c=c, pt=pt)
        rows_in, rows_out, cw = tc * m, (tc // pt) * m2, c
        out_rows, lanes = (t // pt) * m2, c

    def call(xf, ab):
        bl = xf.shape[0]          # LOCAL batch (shard_map passes shards)
        return pl.pallas_call(
            kern,
            grid=(bl, t // tc),
            in_specs=[
                pl.BlockSpec((1, rows_in, lanes), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, lanes), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows_out, cw),
                                   lambda i, j: (i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((bl, out_rows, cw), x4.dtype),
            interpret=interpret,
        )(xf, ab)

    from texttoaudiogrounding_tpu.parallel.kernel_shard import maybe_shard
    out = maybe_shard(call, (xf, ab), (0, None))
    if packed:
        return out.reshape(b, t // 2, 32, 64)
    return out.reshape(b, t // pt, m2, c)


# --------------------------------------------------------------- backward

def _bwd_kernel(x_ref, g_ref, ab_ref, dx_ref, p_ref, *, tc, m, c, pt):
    # generic path: every elem slice has plain channel lanes [c], so
    # gamma/beta/ac apply unsliced and the partials are [c]-laned
    m2 = m // 2
    mu = ab_ref[0, 0:1]
    inv = ab_ref[0, 1:2]
    ga = ab_ref[0, 2:3]
    be = ab_ref[0, 3:4]
    ac = ab_ref[0, 4:5]
    g = g_ref[0].astype(jnp.float32)
    n = (x_ref[0].astype(jnp.float32) - mu) * inv
    nr = n.reshape(tc * m2, 2 * c)            # ONE lane-widening reshape
    if pt == 2:
        a3 = nr[:, :c].reshape(tc // 2, 2 * m2, c)
        b3 = nr[:, c:].reshape(tc // 2, 2 * m2, c)
        # torch window order (dt, dm), flattened to [out_rows, c]
        elems = (a3[:, :m2].reshape(-1, c), b3[:, :m2].reshape(-1, c),
                 a3[:, m2:].reshape(-1, c), b3[:, m2:].reshape(-1, c))
    else:
        elems = (nr[:, :c], nr[:, c:])
    k = len(elems)
    dzs = _route_window_grads(elems, (ga,) * k, (be,) * k, g, 1.0 / k)
    s1 = sum(jnp.sum(dz, axis=0) for dz in dzs)
    s2 = sum(jnp.sum(dz * e, axis=0) for dz, e in zip(dzs, elems))
    ds = [(dz * ac).astype(dx_ref.dtype) for dz in dzs]

    if pt == 2:
        dx_ref[0, :, :m2, 0:c] = ds[0].reshape(tc // 2, m2, c)
        dx_ref[0, :, :m2, c:2 * c] = ds[1].reshape(tc // 2, m2, c)
        dx_ref[0, :, m2:, 0:c] = ds[2].reshape(tc // 2, m2, c)
        dx_ref[0, :, m2:, c:2 * c] = ds[3].reshape(tc // 2, m2, c)
    else:
        dx_ref[0, :, 0:c] = ds[0]
        dx_ref[0, :, c:2 * c] = ds[1]
    p_ref[0, 0] = _row_broadcast(s1, s2, c)


def _bwd_kernel_packed(x_ref, g_ref, ab_ref, dx_ref, p_ref, *, tc):
    # packed block1 path: lanes = (m parity)*64 + c; elem slices are the
    # 64-lane halves, so per-slice gamma/beta/ac are the lane halves too
    mu = ab_ref[0, 0:1]
    inv = ab_ref[0, 1:2]
    ga = ab_ref[0, 2:3]
    be = ab_ref[0, 3:4]
    ac = ab_ref[0, 4:5]
    g = g_ref[0].astype(jnp.float32)
    n = (x_ref[0].astype(jnp.float32) - mu) * inv
    v = n.reshape(tc // 2, 64, 128)           # sublane-only reshape
    rows = tc // 2 * 32
    ne = v[:, :32].reshape(rows, 128)
    no = v[:, 32:].reshape(rows, 128)
    # torch window order (dt, dm): lane-low = m even
    elems = (ne[:, :64], ne[:, 64:], no[:, :64], no[:, 64:])
    gam = (ga[:, :64], ga[:, 64:], ga[:, :64], ga[:, 64:])
    bet = (be[:, :64], be[:, 64:], be[:, :64], be[:, 64:])
    acv = (ac[:, :64], ac[:, 64:], ac[:, :64], ac[:, 64:])
    dzs = _route_window_grads(elems, gam, bet, g, 0.25)
    s1s = [jnp.sum(dz, axis=0) for dz in dzs]
    s2s = [jnp.sum(dz * e, axis=0) for dz, e in zip(dzs, elems)]
    ds = [(dz * av).astype(dx_ref.dtype) for dz, av in zip(dzs, acv)]
    # dx block [tc//2, 64, 128]: middle = (t parity)*32 + m2
    dx_ref[0, :, :32, 0:64] = ds[0].reshape(tc // 2, 32, 64)
    dx_ref[0, :, :32, 64:128] = ds[1].reshape(tc // 2, 32, 64)
    dx_ref[0, :, 32:, 0:64] = ds[2].reshape(tc // 2, 32, 64)
    dx_ref[0, :, 32:, 64:128] = ds[3].reshape(tc // 2, 32, 64)
    # partial lanes mirror the x packing; lane-half STORES (lane-axis
    # concatenate fails to lower — CLAUDE.md Mosaic pitfalls)
    ones8 = jnp.ones((8, 1), jnp.float32)
    p_ref[0, 0, 0:8, 0:64] = ones8 * (s1s[0] + s1s[2])[None, :]
    p_ref[0, 0, 0:8, 64:128] = ones8 * (s1s[1] + s1s[3])[None, :]
    p_ref[0, 0, 8:16, 0:64] = ones8 * (s2s[0] + s2s[2])[None, :]
    p_ref[0, 0, 8:16, 64:128] = ones8 * (s2s[1] + s2s[3])[None, :]


def _run_bwd(x4, g4, ab, pt, tc, interpret, packed):
    """Returns (ac*dz in x4's [B, T2, M, C] layout, s1 [C], s2 [C])."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    m2 = m // 2
    nchunk = t // tc
    if packed:
        xf = x4.reshape(b, t * 32, 128)
        gf = g4.reshape(b, (t // 2) * 32, 64)
        kern = functools.partial(_bwd_kernel_packed, tc=tc)
        in_rows, g_rows, g_lanes = tc * 32, (tc // 2) * 32, 64
        lanes = 128
        out_specs = (
            pl.BlockSpec((1, tc // 2, 64, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 16, 128), lambda i, j: (i, j, 0, 0)),
        )
        dz_dims = (t // 2, 64, 128)
    else:
        xf = x4.reshape(b, t * m, c)
        gf = g4.reshape(b, (t // pt) * m2, c)
        kern = functools.partial(_bwd_kernel, tc=tc, m=m, c=c, pt=pt)
        in_rows, g_rows, g_lanes = tc * m, (tc // pt) * m2, c
        lanes = c
        if pt == 2:
            dspec = pl.BlockSpec((1, tc // pt, pt * m2, 2 * c),
                                 lambda i, j: (i, j, 0, 0))
            dz_dims = (t // pt, pt * m2, 2 * c)
        else:
            dspec = pl.BlockSpec((1, tc * m2, 2 * c),
                                 lambda i, j: (i, j, 0))
            dz_dims = (t * m2, 2 * c)
        out_specs = (
            dspec,
            pl.BlockSpec((1, 1, 16, c), lambda i, j: (i, j, 0, 0)),
        )

    def call(xf, gf, ab):
        bl = xf.shape[0]          # LOCAL batch (shard_map passes shards)
        return pl.pallas_call(
            kern,
            grid=(bl, nchunk),
            in_specs=[
                pl.BlockSpec((1, in_rows, lanes), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, g_rows, g_lanes), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5, lanes), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=(
                jax.ShapeDtypeStruct((bl,) + dz_dims, x4.dtype),
                jax.ShapeDtypeStruct((bl, nchunk, 16, lanes if packed
                                      else c), jnp.float32),
            ),
            interpret=interpret,
        )(xf, gf, ab)

    from texttoaudiogrounding_tpu.parallel.kernel_shard import maybe_shard
    dz, parts = maybe_shard(call, (xf, gf, ab), (0, 0, None),
                            out_dims=(0, 0))
    s1l = jnp.sum(parts[:, :, 0, :], axis=(0, 1))
    s2l = jnp.sum(parts[:, :, 8, :], axis=(0, 1))
    if packed:      # fold the two m-parity lane halves back to channels
        s1, s2 = s1l[:64] + s1l[64:], s2l[:64] + s2l[64:]
    else:           # generic partial lanes are plain channels already
        s1, s2 = s1l, s2l
    if packed:
        dz = dz.reshape(b, t, 32, 128).reshape(b, t, m, c)
    elif pt == 2:
        dz = dz.reshape(b, t // pt, pt, m2, 2, c).reshape(b, t, m, c)
    else:
        dz = dz.reshape(b, t, m2, 2, c).reshape(b, t, m, c)
    return dz, s1, s2


# -------------------------------------------------------- the custom op

def _pack(v, packed):
    """Per-channel [C] -> kernel lane vector ([128] packed or [C])."""
    return jnp.concatenate([v, v]) if packed else v


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _bn_pool_op(x, scale, bias, mean, var, pool, eps, tc, interpret):
    out, _ = _op_fwd(x, scale, bias, mean, var, pool, eps, tc, interpret)
    return out


def _op_fwd(x, scale, bias, mean, var, pool, eps, tc, interpret):
    pt, _ = pool
    packed = _is_packed(x, pool)
    inv = jax.lax.rsqrt(var + eps)
    sc = (scale * inv).astype(jnp.float32)
    sh = (bias - mean * sc).astype(jnp.float32)
    ab = jnp.stack([_pack(sc, packed), _pack(sh, packed)])[None]
    t2 = x.shape[1] // pt * pt               # torch floor pooling
    out = _run_fwd(x[:, :t2], ab, pt, tc, interpret, packed)
    return out, (x, scale, bias, mean, inv)


def _op_bwd(pool, eps, tc, interpret, res, g):
    x, scale, bias, mean, inv = res
    pt, _ = pool
    packed = _is_packed(x, pool)
    t = x.shape[1]
    t2 = t // pt * pt
    ac = (scale * inv).astype(jnp.float32)
    ab = jnp.stack([
        _pack(mean.astype(jnp.float32), packed),
        _pack(inv.astype(jnp.float32), packed),
        _pack(scale.astype(jnp.float32), packed),
        _pack(bias.astype(jnp.float32), packed),
        _pack(ac, packed),
    ])[None]                                   # [1, 5, lanes]
    dz_sc, s1, s2 = _run_bwd(x[:, :t2], g, ab, pt, tc, interpret, packed)
    if t2 != t:                                # dropped tail rows: dz = 0
        dz_sc = jnp.pad(dz_sc, ((0, 0), (0, t - t2), (0, 0), (0, 0)))
    # full train-BN backward: the two per-channel correction terms use
    # the SAME element count the stats were computed over (full T)
    nvals = x.shape[0] * t * x.shape[2]
    c1 = ac * (s1 / nvals)
    c2 = ac * (s2 / nvals)
    n_full = (x.astype(jnp.float32) - mean) * inv
    dx = (dz_sc.astype(jnp.float32) - c1 - n_full * c2).astype(x.dtype)
    zero = jnp.zeros_like(mean)
    return dx, s2.astype(scale.dtype), s1.astype(bias.dtype), zero, zero


_bn_pool_op.defvjp(_op_fwd, _op_bwd)


# ---------------------------------------------------------------- wrapper

def bn_relu_dual_pool(x, scale, bias, *, pool: tuple, eps: float = 1e-5,
                      tc: int | None = None, interpret: bool = False):
    """``avg_pool(h) + max_pool(h)`` for ``h = relu(BN_train(x))``.

    x: ``[B, T, M, C]`` with C >= 128 (or the block1 geometry
    M == C == 64), pool = (pt, 2), pt in {1, 2}, M even.  Batch stats
    are flax-semantics f32 fast-variance over (B, T, M) — computed with
    plain XLA reductions so GSPMD shards them correctly; the custom VJP
    implements the full train-mode BN backward in closed form plus
    torch pool semantics (first-argmax max routing, zero grad at
    relu(0), floor pooling).  Returns ``(out, batch_mean, batch_var)``
    — feed mean/var to the running-average update.
    """
    pt, pm = pool
    assert pm == 2 and pt in (1, 2)
    packed = _is_packed(x, pool)
    t2 = x.shape[1] // pt * pt
    if tc is None:
        tc = _pick_tc(t2, 32 if packed else x.shape[2], pt)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(xf * xf, axis=(0, 1, 2)) - mean * mean,
                      0.0)
    out = _bn_pool_op(x, scale, bias, mean, var, pool, eps, tc, interpret)
    return out, mean, var
