"""Fused PANNs ConvBlock Pallas kernel (serving path).

One kernel computes an entire PANNs block — conv3x3 → BN → ReLU →
conv3x3 → BN → ReLU → dual avg+max pool (reference models/panns.py:20-62)
— per clip, without materializing either conv's full-resolution output in
HBM.  At B=128 x 10 s that intermediate is ~0.5-1 GB per conv per block;
XLA's un-fused pipeline streams it twice per block, which is why blocks
1-2 of Cnn8Rnn measure memory-bound (~58-88 TFLOP/s vs ~150 on the
compute-bound blocks).

Design (TPU-first):
* grid = (batch, time chunks); the whole clip's input ``[T*M, Cin]``
  lives in VMEM (<= 2 MB for every Cnn8Rnn block) and is copied once
  (chunk 0) into a time-zero-padded scratch, so all conv taps read
  in-bounds with SAME zero-padding semantics and no edge branches;
* each chunk stages its padded-input window with ONE dynamic-offset
  copy; every dot then uses static offsets (Mosaic cannot lower dots
  whose operands are dynamically-offset slices, and unrolling all chunks
  in one program blows the compiler up at large working sets);
* a 3x3 conv runs as either 9 shifted MXU dots ``[rows, Cin]@[Cin,Cout]``
  with mel-edge masks on the output rows (``direct9``; free im2col, full
  K utilization for Cin >= 128), or as a mel-im2col staging buffer +
  3 time-tap dots with K = 3*Cin (``mel3``).  ``mel3`` is used when it
  raises MXU K utilization: always for int8 (the int8 MXU path double-
  pumps K and only beats bf16 for K >= 256 — measured: K=128 int8 dots
  are ~2x *slower* than bf16), and for bf16 when Cin < 128;
* BN (running stats, serving) is folded into a per-channel f32 affine in
  the epilogue.  int8 activation quantization is dynamic and per chunk
  (scales computed in-kernel from the staged values), weights are
  pre-quantized per output channel with scales folded into the affine —
  no offline calibration anywhere;
* the dual pool runs on in-register values via row-merge reshapes
  (``[r, C] -> [r/2, 2C]`` column halves = mel pairs; a
  ``[tc/2, 2*m2, C]`` middle-dim split for time pairs — strided gathers
  and wide lane reshapes both fail to lower on Mosaic), so only the
  pooled ``[T/pt, M/pm, Cout]`` tile is written to HBM.

The XLA ConvBlock (models/layers.py) remains the training path and the
numerical reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BN(running stats) as per-channel affine: ``y = x * a + b``."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def _kpad(k: int, quantize: bool) -> int:
    # probed: non-multiple-of-128 lane widths (e.g. 192) lower fine for
    # both bf16 and int8 scratch, so no K padding is needed
    return k


def _vmem_bytes(t, m, cin, cout, pt, pm, tc, quantize, compute_dtype,
                mel3=(False, False)):
    isize = jnp.dtype(compute_dtype).itemsize
    qsize = 1 if quantize else isize
    wsize = 1 if quantize else isize
    rows1 = (tc + 2) * m
    rows2 = tc * m
    rows_x = (tc + 4) * m
    k1 = _kpad(3 * cin, quantize) if mel3[0] else cin
    k2 = _kpad(3 * cout, quantize) if mel3[1] else cout
    xc3 = rows_x * k1 * qsize if mel3[0] else 0
    y2c = rows1 * k2 * qsize if mel3[1] else 0
    w1n = 3 * k1 * cout if mel3[0] else 9 * cin * cout
    w2n = 3 * k2 * cout if mel3[1] else 9 * cout * cout
    return (
        2 * t * m * cin * isize                       # in block (x2 pipeline)
        + 2 * (tc // pt) * (m // pm) * cout * 2       # out block (x2)
        + (t + 4) * m * cin * isize                   # xp
        + (tc + 4) * m * cin * isize                  # xc
        + xc3 + y2c
        + (rows1 + 2) * cout * isize                  # y1
        + rows1 * cout * 4 + rows2 * cout * 4         # acc1/acc2 values
        + 2 * rows2 * cout * 4                        # pool temps
        + (w1n + w2n) * wsize)                        # weights


def _pick_tc(t, m, cin, cout, pt, pm, quantize, compute_dtype,
             mel3=(False, False), max_rows: int = 2000,
             budget: int = 15 * 2**20 + 2**19) -> int:
    """Largest chunk length (input time rows) such that: tc divides t, tc
    is a multiple of pt, the chunk covers <= max_rows flat rows (larger
    chunk working sets crash the Mosaic compiler at large batch), the
    output block's sublane count is a multiple of 8 (Pallas block
    constraint), and the estimated VMEM footprint fits the budget."""
    best = 0
    smallest = 0
    for c in range(pt, t + 1, pt):
        if ((t // pt) % (c // pt) == 0 and c * m <= max_rows
                and ((c // pt) * (m // pm)) % 8 == 0):
            smallest = smallest or c
            if _vmem_bytes(t, m, cin, cout, pt, pm, c, quantize,
                           compute_dtype, mel3) <= budget:
                best = c
    # weights alone can exceed the budget (e.g. f32 test mode); fall back
    # to the smallest structurally-valid chunk rather than failing
    best = best or smallest
    if best == 0:
        raise ValueError(
            f"no valid chunk size for T={t} M={m} {cin}->{cout}")
    return best


def _dual_pool(y, tc: int, m: int, c: int, pt: int, pm: int):
    """avg+max pool of flat ``[tc*m, c]`` -> ``[tc/pt * m/pm, c]``."""
    inv = 1.0 / (pt * pm)
    s, mx = y, y
    m2 = m
    if pm == 2:
        v = y.reshape(tc * m // 2, 2 * c)
        s = v[:, :c] + v[:, c:]
        mx = jnp.maximum(v[:, :c], v[:, c:])
        m2 = m // 2
    if pt == 2:
        vs = s.reshape(tc // 2, 2 * m2, c)
        vm = mx.reshape(tc // 2, 2 * m2, c)
        s = (vs[:, :m2] + vs[:, m2:]).reshape(tc // 2 * m2, c)
        mx = jnp.maximum(vm[:, :m2], vm[:, m2:]).reshape(tc // 2 * m2, c)
    return s * inv + mx


def _quant_i8(x, inv_scale):
    return jnp.clip(jnp.round(x * inv_scale), -127.0, 127.0).astype(jnp.int8)


def _conv9(src_ref, w_ref, rows: int, m: int, cin: int, mask0, mask2,
           acc_dtype):
    """3x3 conv as 9 shifted dots on the flat (t, m) row layout.

    ``src_ref`` is zero-padded so every tap slice ``[dt*m + dm, rows)``
    is in bounds; taps with a mel shift are masked on the output rows
    they corrupt (m==0 / m==M-1)."""
    acc = jnp.zeros((rows, w_ref.shape[1]), acc_dtype)
    # dm-major so each edge mask is applied once to the 3-tap subtotal
    # (per-tap masking costs 6 full-width VPU selects instead of 2)
    for dm in range(3):
        sub = jnp.zeros_like(acc)
        for dt in range(3):
            src = src_ref[dt * m + dm:dt * m + dm + rows]
            sub = sub + jax.lax.dot_general(
                src, w_ref[(dt * 3 + dm) * cin:(dt * 3 + dm + 1) * cin],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        if dm == 0:
            sub = jnp.where(mask0, sub, 0)
        elif dm == 2:
            sub = jnp.where(mask2, sub, 0)
        acc = acc + sub
    return acc


def _mel3_build(dst_ref, src_ref, rows: int, m: int, cin: int, kp: int,
                quantize: bool):
    """Mel-im2col: dst[q, (dm*cin:...)] = src[q + dm] with mel-edge masks
    (dst row q has mel index q % m; src carries a 1-row lead pad).
    Returns the dynamic activation scale (1.0 when not quantized)."""
    mel = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % m
    left = jnp.where(mel != 0, src_ref[0:rows], 0)
    center = src_ref[1:rows + 1]
    right = jnp.where(mel != m - 1, src_ref[2:rows + 2], 0)
    if quantize:
        # per-chunk dynamic scale; |left|,|right| ⊆ |center| values so the
        # center max covers all three columns
        s = jnp.maximum(jnp.max(jnp.abs(
            src_ref[...].astype(jnp.float32))), 1e-6) / 127.0
        inv = 1.0 / s
        left, center, right = (_quant_i8(v.astype(jnp.float32), inv)
                               for v in (left, center, right))
    else:
        s = 1.0
    # three column-slice writes — a lane-axis concatenate fails to lower
    dst_ref[:, 0:cin] = left
    dst_ref[:, cin:2 * cin] = center
    dst_ref[:, 2 * cin:3 * cin] = right
    if kp > 3 * cin:
        dst_ref[:, 3 * cin:] = jnp.zeros((rows, kp - 3 * cin),
                                         dst_ref.dtype)
    return s


def _tri_build1(dst_ref, v, rows: int, m: int, cin: int):
    """Register-resident mel-im2col for conv1: like :func:`_mel3_build`
    but sourced from an in-register VALUE ``v`` ([rows+2, cin], 1-row
    lead/tail already in the padded clip copy) — one load + three
    stores instead of the ref->ref build's four loads + four stores
    (the staging tax that made mel3 lose to direct9, STATUS.md).

    VERDICT (round 4, on-chip, scripts/probe_block34_tri.py): **CLOSED
    — tie or loss vs direct9 at both blocks** (6.70 vs 6.68-7.18 /
    8.44 vs 8.30-8.75 ms int8): acc-chained direct9 dots realize higher
    rates than the isolated-dot NK matrix predicts, so the K=3C rate
    gain never materializes.  tri stays UNROUTED (parity-tested,
    ``tri_1``/``tri_2`` flags)."""
    mel = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % m
    zero = jnp.zeros((), v.dtype)
    dst_ref[:, 0:cin] = jnp.where(mel != 0, v[0:rows], zero)
    dst_ref[:, cin:2 * cin] = v[1:rows + 1]
    dst_ref[:, 2 * cin:3 * cin] = jnp.where(mel != m - 1, v[2:rows + 2],
                                            zero)


def _tri_build2(dst_ref, y1q, rows1: int, m: int, c: int, j):
    """Register-resident mel-im2col for conv2: ``y1q`` ([rows1, c]) has
    no lead/tail rows — its out-of-range taps land exactly on the
    mel-edge-masked rows, so the edge rows of the shifted stores are
    zero slots prefilled once at chunk 0."""
    import jax.experimental.pallas as pl

    mel = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) % m
    zero = jnp.zeros((), y1q.dtype)

    @pl.when(j == 0)
    def _():
        dst_ref[0:1, 0:c] = jnp.zeros((1, c), dst_ref.dtype)
        dst_ref[rows1 - 1:rows1, 2 * c:3 * c] = jnp.zeros(
            (1, c), dst_ref.dtype)

    dst_ref[1:rows1, 0:c] = jnp.where(mel[1:] != 0, y1q[0:rows1 - 1],
                                      zero)
    dst_ref[:, c:2 * c] = y1q
    dst_ref[0:rows1 - 1, 2 * c:3 * c] = jnp.where(
        mel[:rows1 - 1] != m - 1, y1q[1:rows1], zero)


def _conv3(src_ref, w_ref, rows: int, m: int, kp: int, acc_dtype):
    """3 time-tap dots over a mel-im2col buffer; K = kpad(3*Cin)."""
    acc = jnp.zeros((rows, w_ref.shape[1]), acc_dtype)
    for dt in range(3):
        acc = acc + jax.lax.dot_general(
            src_ref[dt * m:dt * m + rows],
            w_ref[dt * kp:(dt + 1) * kp],
            (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    return acc


def _kernel(x_ref, w1_ref, w2_ref, ab_ref, sx_ref, out_ref, xp_ref,
            xc_ref, xc3_ref, y1_ref, y2c_ref, *, t: int, m: int,
            cin: int, cout: int, pt: int, pm: int, tc: int,
            quantize: bool, mel3_1: bool, mel3_2: bool,
            tri_1: bool = False, tri_2: bool = False):
    """Grid = (batch, time chunks).  Chunk ``j`` computes output times
    ``[j*tc, (j+1)*tc)``; the time-padded input copy is built once at
    ``j == 0`` and persists in scratch across the clip's chunks.

    ab_ref: [4, cout] f32 = (a1, b1, a2, b2) folded BN affines; for int8
    the per-output-channel weight scales are folded into a1/a2 and the
    dynamic per-chunk activation scales multiply in inside the kernel.
    sx_ref: [b, 1] SMEM per-CLIP input dequant scales (1.0 when the
    input is not quantized), indexed by program_id(0) — per-clip rather
    than per-batch so int8 serving is batch-equivariant (a sharded
    batch bit-matches the full batch)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # time-padded copy: row 1 + (tt + 2) * m + mel, zeros elsewhere
        xp_ref[0:2 * m + 1] = jnp.zeros((2 * m + 1, cin), xp_ref.dtype)
        xp_ref[pl.ds(2 * m + 1, t * m)] = x_ref[0]
        xp_ref[pl.ds((t + 2) * m + 1, 2 * m + 1)] = jnp.zeros(
            (2 * m + 1, cin), xp_ref.dtype)
        if not tri_2:
            y1_ref[0:1] = jnp.zeros((1, cout), y1_ref.dtype)

    rows1 = (tc + 2) * m                           # conv1 rows (with halo)
    rows2 = tc * m                                 # conv2 rows
    rows_x = (tc + 4) * m
    if not tri_2:
        y1_ref[rows1 + 1:rows1 + 2] = jnp.zeros((1, cout), y1_ref.dtype)

    # stage this chunk's padded-input window with ONE dynamic-offset copy;
    # all reads below use static offsets (dynamic starts on dot operands
    # fail to lower in Mosaic).  tri_1 instead builds the im2col buffer
    # straight from the loaded value (no intermediate copy at all).
    if not tri_1:
        xc_ref[...] = xp_ref[pl.ds(j * rows2, rows_x + 2)]

    acc_dtype = jnp.int32 if quantize else jnp.float32
    a1 = ab_ref[0:1]
    b1 = ab_ref[1:2]
    a2 = ab_ref[2:3]
    b2 = ab_ref[3:4]
    t0 = j * tc

    # ---- conv1: y1 over times [t0-1, t0+tc+1) ----
    if tri_1:
        kp1 = w1_ref.shape[0] // 3
        s1 = sx_ref[pl.program_id(0), 0] if quantize else 1.0
        _tri_build1(xc3_ref, xp_ref[pl.ds(j * rows2, rows_x + 2)],
                    rows_x, m, cin)
        acc1 = _conv3(xc3_ref, w1_ref, rows1, m, kp1, acc_dtype)
    elif mel3_1:
        kp1 = w1_ref.shape[0] // 3
        s1 = _mel3_build(xc3_ref, xc_ref, rows_x, m, cin, kp1, quantize)
        acc1 = _conv3(xc3_ref, w1_ref, rows1, m, kp1, acc_dtype)
    else:
        mel1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) % m
        s1 = sx_ref[pl.program_id(0), 0] if quantize else 1.0
        acc1 = _conv9(xc_ref, w1_ref, rows1, m, cin,
                      mel1 != 0, mel1 != m - 1, acc_dtype)
    trow1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // m
    tvalid = ((trow1 + (t0 - 1)) >= 0) & ((trow1 + (t0 - 1)) < t)
    y1f = acc1.astype(jnp.float32) * (a1 * s1) + b1
    y1f = jnp.where(tvalid, jnp.maximum(y1f, 0.0), 0.0)
    if tri_2:
        # the im2col buffer is built straight from registers; no y1 copy
        if quantize:
            sy = jnp.maximum(jnp.max(y1f), 1e-6) / 127.0
            y1q = _quant_i8(y1f, 1.0 / sy)
        else:
            sy = 1.0
            y1q = y1f.astype(y2c_ref.dtype)
        _tri_build2(y2c_ref, y1q, rows1, m, cout, j)
    elif quantize and not mel3_2:
        # direct9 int8 conv2 consumes an int8 y1: quantize on store
        sy = jnp.maximum(jnp.max(y1f), 1e-6) / 127.0
        y1_ref[pl.ds(1, rows1)] = _quant_i8(y1f, 1.0 / sy)
    else:
        sy = 1.0
        y1_ref[pl.ds(1, rows1)] = y1f.astype(y1_ref.dtype)

    # ---- conv2 + pool over times [t0, t0+tc) ----
    if tri_2:
        kp2 = w2_ref.shape[0] // 3
        s2 = sy
        acc2 = _conv3(y2c_ref, w2_ref, rows2, m, kp2, acc_dtype)
    elif mel3_2:
        kp2 = w2_ref.shape[0] // 3
        s2 = _mel3_build(y2c_ref, y1_ref, rows1, m, cout, kp2, quantize)
        acc2 = _conv3(y2c_ref, w2_ref, rows2, m, kp2, acc_dtype)
    else:
        mel2 = jax.lax.broadcasted_iota(jnp.int32, (rows2, 1), 0) % m
        s2 = sy
        acc2 = _conv9(y1_ref, w2_ref, rows2, m, cout,
                      mel2 != 0, mel2 != m - 1, acc_dtype)
    y2 = jnp.maximum(acc2.astype(jnp.float32) * (a2 * s2) + b2, 0.0)
    pooled = _dual_pool(y2, tc, m, cout, pt, pm)
    out_ref[0] = pooled.astype(out_ref.dtype)


def _prep_w(w, kp: int, quantize: bool, compute_dtype):
    """[3, 3, Cin, Cout] HWIO -> [3*kp, Cout] time-tap-major with the K
    dim (dm, cin) zero-padded to kp; int8-quantized per output channel
    when quantize (returns (w, scales))."""
    three, _, cin, cout = w.shape
    if quantize:
        s = jnp.max(jnp.abs(w), axis=(0, 1, 2))
        s = jnp.maximum(s, 1e-8) / 127.0
        w = _quant_i8(w, 1.0 / s[None, None, None])
    else:
        s = None
        w = w.astype(compute_dtype)
    w = w.reshape(3, 3 * cin, cout)
    if kp > 3 * cin:
        w = jnp.pad(w, ((0, 0), (0, kp - 3 * cin), (0, 0)))
    return w.reshape(3 * kp, cout), s


def fused_double_conv_pool(x: jax.Array, w1: jax.Array, ab1: tuple,
                           w2: jax.Array, ab2: tuple,
                           pool: tuple = (2, 2), *, quantize: bool = False,
                           tc: int | None = None,
                           mel3: tuple | None = None,
                           tri: tuple | None = None,
                           compute_dtype: jnp.dtype = jnp.bfloat16,
                           interpret: bool | None = None) -> jax.Array:
    """Fused (conv3x3->BN->ReLU)x2 -> dual pool for one PANNs block.

    x: ``[B, T, M, Cin]``; w: ``[3, 3, Cin, Cout]`` HWIO; ab: ``(a, b)``
    per-channel folded BN affine (:func:`fold_bn`).  Returns
    ``[B, T//pt, M//pm, Cout]`` (bf16, or ``compute_dtype`` when not
    quantized).  Serving only (running BN stats, no dropout).

    ``mel3`` overrides the per-conv tap mode ``(conv1, conv2)``: True =
    mel-im2col staging + 3 K=3C dots, False = 9 direct dots.  Default
    routing: bf16 small-Cin uses ``(True, False)``, everything else
    ``(False, False)``.  With ``quantize`` a mel3 conv quantizes its
    staged im2col with a per-chunk dynamic scale; a direct9 int8 conv2
    instead consumes an int8 ``y1`` quantized on store.  The combination
    ``quantize=True, mel3=(False, True)`` is rejected: direct9 int8
    conv1 emits an int8 ``y1`` whose scale the mel3 conv2 staging does
    not model.
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
            lambda x_, w1_, a1, b1, w2_, a2, b2: fused_double_conv_pool(
                x_, w1_, (a1, b1), w2_, (a2, b2), pool,
                quantize=quantize, tc=tc, mel3=mel3, tri=tri,
                compute_dtype=compute_dtype, interpret=interpret),
            (x, w1, *ab1, w2, *ab2),
            (0, None, None, None, None, None, None))

    b, t, m, cin = x.shape
    cout = w1.shape[-1]
    pt, pm = pool
    if mel3 is None:
        mel3 = (not quantize and cin < 128, False)
    mel3_1, mel3_2 = mel3
    tri_1, tri_2 = tri if tri is not None else (False, False)
    if tri_1:
        mel3_1 = False
    if tri_2:
        mel3_2 = False
    if quantize and mel3_2 and not mel3_1:
        raise ValueError(
            "quantize=True with mel3=(False, True) is unsupported: int8 "
            "direct9 conv1 stores an int8 y1 whose dynamic scale the mel3 "
            "conv2 staging path does not consume; use (False, False) or "
            "(True, True)")
    in_dtype = compute_dtype
    q_dtype = jnp.int8 if quantize else compute_dtype

    xf = x.reshape(b, t * m, cin)
    if quantize and not mel3_1:
        # direct9 int8 conv1: quantize the input XLA-side (fuses with
        # the producer) with a per-CLIP dynamic scale applied inside the
        # kernel (per-clip, not per-batch, so int8 serving is
        # batch-equivariant — a sharded batch bit-matches the full
        # batch — and the quantization grid is finer); int8 lane dim
        # must be >= 128, so pad Cin with zeros
        sx = jnp.maximum(jnp.max(jnp.abs(xf.astype(jnp.float32)),
                                 axis=(1, 2), keepdims=True),
                         1e-6) / 127.0
        xf = _quant_i8(xf.astype(jnp.float32), 1.0 / sx)
        sxv = sx.reshape(b, 1)
        if cin < 128:
            xf = jnp.pad(xf, ((0, 0), (0, 0), (0, 128 - cin)))
            w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 128 - cin), (0, 0)))
            cin = 128
        in_dtype = jnp.int8
    else:
        sxv = jnp.ones((b, 1), jnp.float32)
        xf = xf.astype(in_dtype)
    kp1 = _kpad(3 * cin, quantize) if (mel3_1 or tri_1) else cin
    kp2 = _kpad(3 * cout, quantize) if (mel3_2 or tri_2) else cout
    if mel3_1 or tri_1:
        w1f, sw1 = _prep_w(w1, kp1, quantize, compute_dtype)
    elif quantize:
        s = jnp.maximum(jnp.max(jnp.abs(w1), axis=(0, 1, 2)), 1e-8) / 127.0
        w1f = _quant_i8(w1, 1.0 / s[None, None, None]).reshape(
            9 * cin, cout)
        sw1 = s  # the per-clip input scale multiplies in-kernel (sx_ref)
    else:
        w1f = w1.astype(compute_dtype).reshape(9 * cin, cout)
        sw1 = None
    if mel3_2 or tri_2:
        w2f, sw2 = _prep_w(w2, kp2, quantize, compute_dtype)
    elif quantize:
        s = jnp.maximum(jnp.max(jnp.abs(w2), axis=(0, 1, 2)), 1e-8) / 127.0
        w2f = _quant_i8(w2, 1.0 / s[None, None, None]).reshape(
            9 * cout, cout)
        sw2 = s
    else:
        w2f = w2.astype(compute_dtype).reshape(9 * cout, cout)
        sw2 = None

    a1, bb1 = ab1
    a2, bb2 = ab2
    if quantize:
        a1 = a1 * sw1
        a2 = a2 * sw2
    ab = jnp.stack([a1, bb1, a2, bb2]).astype(jnp.float32)

    tc = tc or _pick_tc(t, m, cin, cout, pt, pm, quantize, compute_dtype,
                        (mel3_1 or tri_1, mel3_2 or tri_2))
    rows1 = (tc + 2) * m
    rows_x = (tc + 4) * m

    kern = functools.partial(_kernel, t=t, m=m, cin=cin, cout=cout,
                             pt=pt, pm=pm, tc=tc, quantize=quantize,
                             mel3_1=mel3_1, mel3_2=mel3_2,
                             tri_1=tri_1, tri_2=tri_2)
    out = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, t * m, cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            # per-clip scalars: the whole [b, 1] vector in SMEM (blocks
            # equal to the array dims satisfy the tiling rule; (1, 1)
            # blocks do not), indexed by program_id(0) in-kernel
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, (tc // pt) * (m // pm), cout), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (t // pt) * (m // pm), cout),
            jnp.bfloat16 if quantize else in_dtype),
        scratch_shapes=[
            pltpu.VMEM(((t + 4) * m + 2, cin), in_dtype),       # xp
            pltpu.VMEM((rows_x + 2, cin) if not tri_1
                       else (8, 128), in_dtype),                # xc (chunk)
            pltpu.VMEM((rows_x, kp1) if (mel3_1 or tri_1) else (8, 128),
                       q_dtype),                                # xc3
            pltpu.VMEM((rows1 + 2, cout) if not tri_2 else (8, 128),
                       jnp.int8 if quantize and not mel3_2
                       else in_dtype),                          # y1
            pltpu.VMEM((rows1, kp2) if (mel3_2 or tri_2) else (8, 128),
                       q_dtype),                                # y2c
        ],
        interpret=interpret,
    )(xf, w1f, w2f, ab, sxv)
    return out.reshape(b, t // pt, m // pm, cout)


# --------------------------------------------------------------------------
# Mel-pair-packed variant (blocks with Cout < 256: Cnn8Rnn blocks 1-2).
#
# Rows are (t, mel-pair) and the N dim packs (mel parity p, out channel):
# N = 2*Cout, so a Cout=64/128 conv still fills the 128/256 MXU lanes.
# The conv weight becomes a banded matrix over K = (group, p_src, Cin)
# (three full-width row-shifted input copies; 4 of the 6 K half-groups
# carry weights, the rest are zero).  Every dot has K = 6*Cin >= 384,
# which keeps the int8 MXU double-pumped (K=128 int8 dots are ~2x slower
# than bf16, see module docstring), at 50-66%% band utilization.
# --------------------------------------------------------------------------


def _band_w(w, dt: int, compute_dtype, quantize: bool):
    """One time-tap of the banded pair weight: [6*Cin, 2*Cout].

    K rows are (group, p_src, cin) matching :func:`_pair4_build`'s
    full-width group layout; mel offset dm4 = {g0: 1 + p_src,
    g1: 0 (p_src=1 only), g2: 3 (p_src=0 only)}, and the weight element
    for output parity p_out is w[dt, dm4 - p_out] when in the band."""
    three, _, cin, cout = w.shape
    wb = jnp.zeros((3, 2, cin, 2, cout), jnp.float32)
    slots = {(0, 0): 1, (0, 1): 2, (1, 1): 0, (2, 0): 3}
    for (g, p_src), dm4 in slots.items():
        for p_out in range(2):
            if 0 <= dm4 - p_out <= 2:
                wb = wb.at[g, p_src, :, p_out].set(
                    w[dt, dm4 - p_out].astype(jnp.float32))
    wb = wb.reshape(6 * cin, 2 * cout)
    if quantize:
        return wb  # quantized jointly by the caller
    return wb.astype(compute_dtype)


def _prep_pair_w(w, compute_dtype, quantize: bool):
    """[3, 3, Cin, Cout] -> [3*(4*Cin), 2*Cout] banded; int8 per-(p,
    co)-channel quantized (returns (w, scales[2*Cout]))."""
    taps = jnp.concatenate(
        [_band_w(w, dt, compute_dtype, quantize) for dt in range(3)], axis=0)
    if quantize:
        s = jnp.maximum(jnp.max(jnp.abs(taps), axis=0), 1e-8) / 127.0
        return _quant_i8(taps, 1.0 / s[None]), s
    return taps.astype(compute_dtype), None


def _pair4_build(dst_ref, src_ref, rows: int, mp: int, c0: int,
                 quantize: bool, src_scale=None, src_off: int = 0):
    """Pair-layout im2col: dst[q, (dm4*c0:...)] = the (p', mp') lane/row
    slice of src for dm4 in [0, 4) (see module comment), with mel-pair
    edge masks.  src rows are (t, mp) with lanes (p, c0) and a 1-row lead
    pad at ``src_off``; dst row q has pair index q % mp.

    Returns the activation scale used for int8 (1.0 otherwise)."""
    # dst is 3 groups of 2*c0 columns, each a FULL-width row-shifted copy
    # of src (sub-tile lane slices and pltpu.roll both fail to lower):
    #   g0 = src[o+1]  (center row: both halves used, dm4 = 1+p_src)
    #   g1 = src[o]    (only the p_src=1 half used -> dm4=0; p_src=0 rows
    #                   get zero weights)
    #   g2 = src[o+2]  (only the p_src=0 half used -> dm4=3)
    # The unused halves cost K utilization (4/6 of the band), not builds.
    if quantize:
        if src_scale is None:
            s = jnp.maximum(jnp.max(jnp.abs(
                src_ref[...].astype(jnp.float32))), 1e-6) / 127.0
        else:
            s = src_scale
    else:
        s = 1.0

    def q(v):
        if quantize and v.dtype != jnp.int8:
            return _quant_i8(v.astype(jnp.float32), 1.0 / s)
        return v

    o = src_off
    melp = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % mp
    dst_ref[:, 0:2 * c0] = q(src_ref[o + 1:o + 1 + rows])
    dst_ref[:, 2 * c0:4 * c0] = q(jnp.where(
        melp != 0, src_ref[o:o + rows],
        jnp.zeros((), src_ref.dtype)))
    dst_ref[:, 4 * c0:6 * c0] = q(jnp.where(
        melp != mp - 1, src_ref[o + 2:o + 2 + rows],
        jnp.zeros((), src_ref.dtype)))
    return s


def _pair_kernel(x_ref, w1_ref, w2_ref, ab_ref, out_ref, xp_ref, xc_ref,
                 x4_ref, y1_ref, y4_ref, *, t: int, mp: int, c0: int,
                 cout: int, pt: int, tc: int, quantize: bool,
                 skip_conv1: bool):
    """Pair-layout fused block.  Grid = (batch, out-time chunks of tc).

    x: rows (t, mp), lanes (p, c0) — 2*c0 wide.  When ``skip_conv1`` the
    input is already the first conv's activation (int8 pre-quantized
    XLA-side with the scale folded into ab) and only conv2+pool run.
    ab_ref: [4, 2*cout] tiled (p, co) affines."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    lanes = x_ref.shape[-1]

    @pl.when(j == 0)
    def _():
        xp_ref[0:2 * mp + 1] = jnp.zeros((2 * mp + 1, lanes), xp_ref.dtype)
        xp_ref[pl.ds(2 * mp + 1, t * mp)] = x_ref[0]
        xp_ref[pl.ds((t + 2) * mp + 1, 2 * mp + 1)] = jnp.zeros(
            (2 * mp + 1, lanes), xp_ref.dtype)
        if not skip_conv1:
            y1_ref[0:1] = jnp.zeros((1, 2 * cout), y1_ref.dtype)

    rows1 = (tc + 2) * mp
    rows2 = tc * mp
    rows_x = (tc + 4) * mp
    acc_dtype = jnp.int32 if quantize else jnp.float32
    a1 = ab_ref[0:1]
    b1 = ab_ref[1:2]
    a2 = ab_ref[2:3]
    b2 = ab_ref[3:4]
    t0 = j * tc

    xc_ref[...] = xp_ref[pl.ds(j * rows2, rows_x + 2)]

    if skip_conv1:
        # conv2 reads the staged input directly; its 1-time-row lead pad
        # relative to conv2's output range is mp rows into xc
        src_ref, src_off = xc_ref, mp
    else:
        y1_ref[rows1 + 1:rows1 + 2] = jnp.zeros((1, 2 * cout),
                                                y1_ref.dtype)
        s1 = _pair4_build(x4_ref, xc_ref, rows_x, mp, c0, quantize)
        kp1 = w1_ref.shape[0] // 3
        acc1 = _conv3(x4_ref, w1_ref, rows1, mp, kp1, acc_dtype)
        trow = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // mp
        tval = ((trow + (t0 - 1)) >= 0) & ((trow + (t0 - 1)) < t)
        y1f = acc1.astype(jnp.float32) * (a1 * s1) + b1
        y1f = jnp.where(tval, jnp.maximum(y1f, 0.0), 0.0)
        y1_ref[pl.ds(1, rows1)] = y1f.astype(y1_ref.dtype)
        src_ref, src_off = y1_ref, 0

    sy = _pair4_build(y4_ref, src_ref, rows1, mp, cout, quantize,
                      src_scale=1.0 if skip_conv1 and quantize else None,
                      src_off=src_off)
    kp2 = w2_ref.shape[0] // 3
    acc2 = _conv3(y4_ref, w2_ref, rows2, mp, kp2, acc_dtype)
    y2 = jnp.maximum(acc2.astype(jnp.float32) * (a2 * sy) + b2, 0.0)

    # mel pool: lane halves (p); time pool: adjacent mp-row blocks
    c = cout
    s = (y2[:, :c] + y2[:, c:]) * (1.0 / (2 * pt))
    mx = jnp.maximum(y2[:, :c], y2[:, c:])
    if pt == 2:
        vs = s.reshape(rows2 // (2 * mp), 2 * mp, c)
        vm = mx.reshape(rows2 // (2 * mp), 2 * mp, c)
        s = (vs[:, :mp] + vs[:, mp:]).reshape(rows2 // 2, c)
        mx = jnp.maximum(vm[:, :mp], vm[:, mp:]).reshape(rows2 // 2, c)
    out_ref[0] = (s + mx).astype(out_ref.dtype)


def fused_pair_conv_pool(x: jax.Array, w1, ab1, w2, ab2,
                         pool: tuple = (2, 2), *, quantize: bool = False,
                         tc: int | None = None, x_scale=None,
                         compute_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """Pair-packed fused PANNs block for Cout < 256 (pm must be 2).

    x: ``[B, T, M, Cin]``; returns ``[B, T//pt, M//2, Cout]``.
    ``w1=None`` skips conv1 (block1 mode: x is the conv1 activation,
    int8 with ``x_scale`` when quantize).  T must be divisible by the
    chunking; pad T with zero rows beforehand if needed (extra pooled
    rows are sliced off by the caller).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, cin = x.shape
    cout = w2.shape[-1]
    pt, pm = pool
    assert pm == 2, "pair kernel pools mel pairs by construction"
    mp = m // 2
    skip_conv1 = w1 is None
    in_dtype = jnp.int8 if (skip_conv1 and quantize) else compute_dtype

    xf = x.reshape(b, t * mp, 2 * cin).astype(in_dtype)

    def tile2(v):
        # N lane order is (p, co): duplicating matches p * cout + co
        return jnp.concatenate([jnp.asarray(v, jnp.float32)] * 2)

    a1, bb1 = ab1 if ab1 is not None else (jnp.ones((cout,)),
                                           jnp.zeros((cout,)))
    a2, bb2 = ab2
    a1, bb1, a2, bb2 = map(tile2, (a1, bb1, a2, bb2))
    if skip_conv1:
        w1f = jnp.zeros((3, 128), in_dtype)  # placeholder ref
        if quantize:
            w2f, sw2 = _prep_pair_w(w2, compute_dtype, True)
            a2 = a2 * sw2 * (x_scale if x_scale is not None else 1.0)
        else:
            w2f, _ = _prep_pair_w(w2, compute_dtype, False)
    else:
        w1f, sw1 = _prep_pair_w(w1, compute_dtype, quantize)
        w2f, sw2 = _prep_pair_w(w2, compute_dtype, quantize)
        if quantize:
            a1 = a1 * sw1
            a2 = a2 * sw2
    ab = jnp.stack([a1, bb1, a2, bb2]).astype(jnp.float32)

    if tc is None:
        best = 0
        for c in range(pt, t + 1, pt):
            if (t % c == 0 and c * mp <= 2000
                    and ((c // pt) * mp) % 8 == 0):
                best = c
        if best == 0:
            raise ValueError(f"no valid pair chunk for T={t} M={m}")
        tc = best
    rows1 = (tc + 2) * mp
    rows_x = (tc + 4) * mp
    q_dtype = jnp.int8 if quantize else compute_dtype

    kern = functools.partial(_pair_kernel, t=t, mp=mp, c0=cin, cout=cout,
                             pt=pt, tc=tc, quantize=quantize,
                             skip_conv1=skip_conv1)
    out = pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, t * mp, 2 * cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, (tc // pt) * mp, cout), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (t // pt) * mp, cout),
            jnp.bfloat16 if quantize else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM(((t + 4) * mp + 2, 2 * cin), in_dtype),   # xp
            pltpu.VMEM((rows_x + 2, 2 * cin), in_dtype),         # xc
            pltpu.VMEM((rows_x, 6 * cin) if not skip_conv1
                       else (8, 128), q_dtype),                  # x4
            pltpu.VMEM((rows1 + 2, 2 * cout) if not skip_conv1
                       else (8, 128), compute_dtype),            # y1
            pltpu.VMEM((rows1, 6 * cout), q_dtype),              # y4
        ],
        interpret=interpret,
    )(xf, w1f, w2f, ab)
    return out.reshape(b, t // pt, mp, cout)
