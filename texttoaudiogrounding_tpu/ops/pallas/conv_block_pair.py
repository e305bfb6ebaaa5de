"""Parity-split pair-packed Pallas kernel for Cin=64 PANNs blocks.

Round-3 rebuild of the blocks-1/2 frontier (reference FLOPs contract
``/root/reference/models/panns.py:5-62``; the fused blocks 3-4 kernel is
``conv_block.py``).  The round-3 probe campaign
(scripts/probe_dma_bisect.py, probe_k128_sweep.py, probe_nk_matrix.py)
established on-chip that

* STATIC sublane-offset slices of a VMEM ref are free as dot operands
  (no relayout penalty vs offset-0) — a 3x3 conv needs NO im2col;
* int8 K=128 acc-chained dots sustain ~170 TOP/s (the earlier
  "int8 needs K>=384" rule was an artifact of the measured designs);
* misaligned (+-1 row) DMA staging is impossible for bf16/int8, and the
  serialized VPU staging it would replace is exactly what made the
  earlier pair-dense designs (conv_block_small.py) tie with XLA.

Design: mel pairs ride the lane axis (``[B, T, M, 64] -> [B, T*M/2,
128]`` — a free XLA reshape), so every dot has K=128 despite Cin=64.
Conv outputs split by mel parity into two full-width buffers:

* conv1 (64->C): for even output mels, the dm=0 tap lives in the odd
  half-lanes of pair row r-1 and taps dm=1,2 in pair row r — 2 dots
  per time tap (one with a half-zero K), 12 dots total, 75 % MAC
  efficiency, zero staging;
* conv2 (C->C, C>=128): even-mel inputs are exactly ``y1_even[r]`` and
  odd-mel ``y1_odd[r +- {0,1}]`` — 18 full dots, 100 % efficiency;
* mel edge taps are masked on pair-row index (one mask per 3-dot
  subtotal, the conv_block.py dm-major trick); time edges use a
  zero-padded whole-clip input copy built at chunk 0, and conv1 rows at
  out-of-clip times are zeroed so conv2 sees the reference's zero-pad;
* the 2x2 pool needs no reshape for mel (the two parities ARE the mel
  pair) and reuses the middle-dim split trick for time;
* int8: per-chunk dynamic activation scales (input at stage time, y1 on
  store), per-output-channel weight scales folded into the BN affines —
  the same no-calibration contract as conv_block.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    _quant_i8,
    fold_bn,
)

__all__ = ["fused_block2_pair", "fold_bn"]


def _pair_w1(w1: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 64, C] HWIO -> [12*128, C]: per time tap dt the four
    K=128 matrices (a, b, c, d) of the parity-split conv1 dots:

      even out (mel 2j):  a @ x[r-1] (rows 64:128 = w[dt,0], 0:64 = 0)
                        + b @ x[r]   (0:64 = w[dt,1], 64:128 = w[dt,2])
      odd  out (mel 2j+1): c @ x[r]  (0:64 = w[dt,0], 64:128 = w[dt,1])
                        + d @ x[r+1] (0:64 = w[dt,2], 64:128 = 0)
    """
    three, _, cin, cout = w1.shape
    assert three == 3 and cin == 64
    z = jnp.zeros((64, cout), w1.dtype)
    mats = []
    for dt in range(3):
        mats += [
            jnp.concatenate([z, w1[dt, 0]], 0),            # a
            jnp.concatenate([w1[dt, 1], w1[dt, 2]], 0),    # b
            jnp.concatenate([w1[dt, 0], w1[dt, 1]], 0),    # c
            jnp.concatenate([w1[dt, 2], z], 0),            # d
        ]
    return jnp.concatenate(mats, 0)


def _quant_w(w: jnp.ndarray):
    """Per-output-channel int8 quantization of a packed weight matrix."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    return _quant_i8(w, 1.0 / s[None]), s


def _kernel(x_ref, w1_ref, w2_ref, ab_ref, out_ref, xp_ref, xc_ref,
            xq_ref, y1e_ref, y1o_ref, *, t: int, mp: int, cout: int,
            tc: int, quantize: bool):
    """Grid = (batch, time chunks of tc).

    xp: whole-clip pair-packed input (built once per clip), 2 zero-pad
    time steps each side plus 1 lead/tail row:
    row(tt, j) = (tt + 2) * mp + j + 1.
    xc/xq: this chunk's window (one dynamic-offset copy; quantized copy
    when int8) — all dot operands below use STATIC offsets into it.
    y1e/y1o: conv1 parity outputs for times [t0-1, t0+tc+1), 1 zero
    lead/tail row: row(p, j) = p * mp + j + 1.
    ab: [4, cout] f32 rows = folded affines a1, b1, a2, b2 (int8 weight
    scales pre-folded; dynamic activation scales multiplied in here).
    """
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)
    rows1 = (tc + 2) * mp
    rows2 = tc * mp
    rows_x = (tc + 4) * mp + 2
    acc_dtype = jnp.int32 if quantize else jnp.float32

    @pl.when(jj == 0)
    def _():
        lead = 2 * mp + 1
        xp_ref[0:lead] = jnp.zeros((lead, 128), xp_ref.dtype)
        xp_ref[pl.ds(lead, t * mp)] = x_ref[0].astype(xp_ref.dtype)
        xp_ref[pl.ds(lead + t * mp, lead)] = jnp.zeros(
            (lead, 128), xp_ref.dtype)
        zr = jnp.zeros((1, cout), y1e_ref.dtype)
        y1e_ref[0:1] = zr
        y1o_ref[0:1] = zr

    y1e_ref[rows1 + 1:rows1 + 2] = jnp.zeros((1, cout), y1e_ref.dtype)
    y1o_ref[rows1 + 1:rows1 + 2] = jnp.zeros((1, cout), y1o_ref.dtype)

    # stage this chunk's window with ONE dynamic-offset read (dots on
    # dynamically-offset slices fail to lower in Mosaic); int8 quantizes
    # from registers so only the int8 copy is ever stored
    xv = xp_ref[pl.ds(jj * rows2, rows_x)]
    if quantize:
        xf32 = xv.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf32)), 1e-6) / 127.0
        xq_ref[...] = _quant_i8(xf32, 1.0 / sx)
        src = xq_ref
    else:
        sx = 1.0
        xc_ref[...] = xv
        src = xc_ref

    a1 = ab_ref[0:1]
    b1 = ab_ref[1:2]
    a2 = ab_ref[2:3]
    b2 = ab_ref[3:4]
    t0 = jj * tc

    def w1m(i):
        return w1_ref[i * 128:(i + 1) * 128]

    def w2m(dt, dm):
        return w2_ref[(dt * 3 + dm) * cout:(dt * 3 + dm + 1) * cout]

    # ---- conv1: two parity accumulators, 12 K=128 dots ----
    # conv1 row (p, j) = p*mp + j reads chunk-local input rows
    # (p + dt)*mp + j + 1 + s for time tap dt, pair shift s
    def c1(shift, mat):
        acc = jnp.zeros((rows1, cout), acc_dtype)
        for dt in range(3):
            acc = acc + jax.lax.dot_general(
                src[pl.ds(dt * mp + 1 + shift, rows1)],
                w1m(4 * dt + mat), (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        return acc

    pj1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) % mp
    acc_e = jnp.where(pj1 != 0, c1(-1, 0), 0) + c1(0, 1)
    acc_o = c1(0, 2) + jnp.where(pj1 != mp - 1, c1(1, 3), 0)

    p1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // mp
    tvalid = ((p1 + (t0 - 1)) >= 0) & ((p1 + (t0 - 1)) < t)
    a1s = a1 * sx if quantize else a1
    y1e_f = jnp.where(tvalid, jnp.maximum(
        acc_e.astype(jnp.float32) * a1s + b1, 0.0), 0.0)
    y1o_f = jnp.where(tvalid, jnp.maximum(
        acc_o.astype(jnp.float32) * a1s + b1, 0.0), 0.0)
    if quantize:
        sy = jnp.maximum(jnp.maximum(jnp.max(y1e_f), jnp.max(y1o_f)),
                         1e-6) / 127.0
        inv = 1.0 / sy
        y1e_ref[pl.ds(1, rows1)] = _quant_i8(y1e_f, inv)
        y1o_ref[pl.ds(1, rows1)] = _quant_i8(y1o_f, inv)
    else:
        sy = 1.0
        y1e_ref[pl.ds(1, rows1)] = y1e_f.astype(y1e_ref.dtype)
        y1o_ref[pl.ds(1, rows1)] = y1o_f.astype(y1o_ref.dtype)

    # ---- conv2: 18 full K=cout dots ----
    # conv2 row (q, j) reads y1 rows (q + dt)*mp + j + 1 + s
    def c2(ref, shift, dm):
        acc = jnp.zeros((rows2, cout), acc_dtype)
        for dt in range(3):
            acc = acc + jax.lax.dot_general(
                ref[pl.ds(dt * mp + 1 + shift, rows2)], w2m(dt, dm),
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        return acc

    pj2 = jax.lax.broadcasted_iota(jnp.int32, (rows2, 1), 0) % mp
    acc2_e = (jnp.where(pj2 != 0, c2(y1o_ref, -1, 0), 0)
              + c2(y1e_ref, 0, 1) + c2(y1o_ref, 0, 2))
    acc2_o = (c2(y1e_ref, 0, 0) + c2(y1o_ref, 0, 1)
              + jnp.where(pj2 != mp - 1, c2(y1e_ref, 1, 2), 0))

    a2s = a2 * sy if quantize else a2
    ye = jnp.maximum(acc2_e.astype(jnp.float32) * a2s + b2, 0.0)
    yo = jnp.maximum(acc2_o.astype(jnp.float32) * a2s + b2, 0.0)

    # pool 2x2: mel pool = the parity pair itself; time pool = the
    # middle-dim split trick
    s = ye + yo
    mx = jnp.maximum(ye, yo)
    vs = s.reshape(tc // 2, 2 * mp, cout)
    vm = mx.reshape(tc // 2, 2 * mp, cout)
    s = (vs[:, :mp] + vs[:, mp:]).reshape(tc // 2 * mp, cout)
    mx = jnp.maximum(vm[:, :mp], vm[:, mp:]).reshape(tc // 2 * mp, cout)
    out_ref[0] = (s * 0.25 + mx).astype(out_ref.dtype)


def fused_block2_pair(x: jax.Array, w1: jax.Array, ab1: tuple,
                      w2: jax.Array, ab2: tuple, *,
                      quantize: bool = False, tc: int | None = None,
                      compute_dtype: jnp.dtype = jnp.bfloat16,
                      interpret: bool | None = None) -> jax.Array:
    """Fused (conv3x3->BN->ReLU)x2 -> dual 2x2 pool, Cin=64 parity
    design (reference models/panns.py:20-62 ConvBlock semantics).

    x: ``[B, T, M, 64]`` (M even, T % tc == 0); w1 ``[3, 3, 64, C]``,
    w2 ``[3, 3, C, C]`` HWIO with C a multiple of 128; ab: ``(a, b)``
    folded BN affines (:func:`fold_bn`).  Returns ``[B, T//2, M//2, C]``
    bf16.  Serving only (running BN stats).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return maybe_shard(
            lambda x_, w1_, a1, b1, w2_, a2, b2: fused_block2_pair(
                x_, w1_, (a1, b1), w2_, (a2, b2), quantize=quantize,
                tc=tc, compute_dtype=compute_dtype, interpret=interpret),
            (x, w1, *ab1, w2, *ab2),
            (0, None, None, None, None, None, None))

    b, t, m, cin = x.shape
    assert cin == 64 and m % 2 == 0
    cout = w1.shape[-1]
    mp = m // 2
    if tc is None:
        tc = _pick_tc_pair(t, mp, cout=cout, quantize=quantize,
                           compute_dtype=compute_dtype)

    dt_y = jnp.int8 if quantize else compute_dtype
    w1p = _pair_w1(jnp.asarray(w1, jnp.float32))
    w2p = jnp.asarray(w2, jnp.float32).reshape(9 * cout, cout)
    a1, b1 = (jnp.asarray(v, jnp.float32) for v in ab1)
    a2, b2 = (jnp.asarray(v, jnp.float32) for v in ab2)
    if quantize:
        w1p, s1 = _quant_w(w1p)
        w2p, s2 = _quant_w(w2p)
        a1 = a1 * s1
        a2 = a2 * s2
    else:
        w1p = w1p.astype(compute_dtype)
        w2p = w2p.astype(compute_dtype)
    ab = jnp.stack([a1, b1, a2, b2], 0)

    xf = x.reshape(b, t * mp, 2 * cin).astype(compute_dtype)

    kern = functools.partial(_kernel, t=t, mp=mp, cout=cout, tc=tc,
                             quantize=quantize)
    rows1 = (tc + 2) * mp
    rows_x = (tc + 4) * mp + 2
    out = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, t * mp, 128), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((12 * 128, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((9 * cout, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((4, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tc // 2 * mp, cout),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, t // 2 * mp, cout),
            jnp.bfloat16 if quantize else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM(((t + 4) * mp + 2, 128), compute_dtype),
            pltpu.VMEM((rows_x, 128) if not quantize else (8, 128),
                       compute_dtype),
            pltpu.VMEM((rows_x, 128) if quantize else (8, 128), jnp.int8),
            pltpu.VMEM((rows1 + 2, cout), dt_y),
            pltpu.VMEM((rows1 + 2, cout), dt_y),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xf, w1p, w2p, ab)
    return out.reshape(b, t // 2, mp, cout)


def _pair_vmem_bytes(t: int, mp: int, tc: int, cout: int,
                     quantize: bool, compute_dtype) -> int:
    """Grid-step VMEM estimate for :func:`fused_block2_pair`: the
    whole-clip xp scratch + double-buffered resident input block scale
    with T (long clips must fall back to XLA, not crash Mosaic), plus
    the per-chunk buffers, weights and double-buffered out block."""
    import numpy as np
    itb = np.dtype(compute_dtype).itemsize
    wb = 1 if quantize else itb
    rows1 = (tc + 2) * mp
    rows_x = (tc + 4) * mp + 2
    total = ((t + 4) * mp + 2) * 128 * itb          # xp (whole clip)
    total += 2 * t * mp * 128 * itb                 # x in-block (dbuf)
    total += (rows_x if not quantize else 8) * 128 * itb   # xc
    total += (rows_x if quantize else 8) * 128              # xq (int8)
    total += 2 * (rows1 + 2) * cout * wb            # y1e + y1o
    total += (12 * 128 * cout + 9 * cout * cout) * wb + 4 * cout * 4
    total += 2 * (tc // 2 * mp) * cout * (2 if quantize else itb)
    return total


def _pick_tc_pair(t: int, mp: int, max_rows: int = 2000,
                  cout: int = 128, quantize: bool = True,
                  compute_dtype=jnp.bfloat16,
                  vmem_budget: int = 15 * 2**20) -> int:
    """Largest even tc dividing t with (tc+2)*mp <= max_rows, the
    pooled block sublane count (tc//2*mp) a multiple of 8, and the
    grid-step VMEM estimate within budget (the whole-clip staging grows
    with T, so very long clips get a ValueError → XLA fallback)."""
    best = 0
    for c in range(2, t + 1, 2):
        if (t % c == 0 and (c + 2) * mp <= max_rows
                and (c // 2 * mp) % 8 == 0
                and _pair_vmem_bytes(t, mp, c, cout, quantize,
                                     compute_dtype) <= vmem_budget):
            best = c
    if best == 0:
        raise ValueError(f"no valid pair-chunk for T={t} mp={mp}")
    return best
