"""Fused Cin=1 PANNs block-1 Pallas kernel (serving path).

Round-4 attack on the block1 wall named by the round-3 verdict: block1
(conv 1->64 -> conv 64->64 -> dual 2x2 pool) measures ~11.1 ms of the
33.8 ms serving step on XLA — data-movement-bound (~1 GB of inter-conv
activations) with 64-channel geometry that starves the MXU.  Reference
FLOPs contract: /root/reference/models/panns.py:5-62 (ConvBlock) as
instantiated by Cnn8Rnn's first block
(/root/reference/models/audio_encoder.py:96-118).

Design — everything register-resident; the input is PRE-conv1 and thus
~32x smaller than the other blocks', so staging is ~free:

* conv1 (Cin=1) runs as ONE K=192 dot per chunk into a 64*M-wide
  accumulator: the operand packs the three time taps on the lane axis
  (``xw3[v] = [X[v-2] | X[v-1] | X[v]]``, built XLA-side in int8 where
  it fuses with the frontend), and the banded weight matrix
  [(dt, mel_in), (m_out, c)] absorbs the 3x3 taps AND the mel zero-pad
  structurally (band truncation) — zero wasted K.  N = 64*M =
  m_out-major x channel: exactly the (mel-pair r, parity p, channel c)
  lane packing conv2 wants, so no relayout follows the dot.
* conv2's K=128 dots are the measured MXU wall at this geometry (~150
  TOP/s); int8 K=384 N=128 dots sustain 278 TOP/s
  (scripts/probe_nk_matrix.py; this kernel's conv2 measures ~257).
  conv1's activation is quantized in registers and stored THREE times —
  lane blocks ``[y1[r-1] | y1[r] | y1[r+1]]`` of a flat (mel-pair-block
  major, time) scratch — so conv2 runs as 3 time-tap dots with K=384 at
  50% band density and ZERO ref-to-ref staging (the serialized-VPU tax
  that killed every previous blocks-1/2 fused design, see
  scripts/probe_dma_window.py).
* the flat scratch gives conv2 plain static sublane-offset slices
  (free as dot operands).  Each mel-pair block carries the 2-row time
  halo, so taps near block edges read 2 garbage rows per block (~4%
  overcompute) that the pool discards — no strided refs.  Mel-pair
  edges are zero SLOTS written once at chunk 0; the only time-edge fix
  is zeroing each block's t=-1 row at chunk 0 (outputs in the padded
  time tail are pooled away, so no per-step validity masks exist at
  all).
* mel-pair blocks are laid out even-pairs-first (r = 0,2,..,30,1,..,31)
  so the pooled tile groups into (r%2, quad, t') and the packed output
  store is TWO lane-half stores instead of 32; the stored tile is
  already in block2's packed (pooled-pair, parity, channel) lane
  order.  One XLA transpose (quad, time) -> (time, quad) finishes the
  handoff; the block1->block2 reshape chain then collapses to a no-op.

Round-5 on-chip quantization ladder (same-session standalone, B=128,
T=1001, chip_playbook_r5e): **mixed 9.76 ms** (``quantize="conv1"``,
the serving default) < bf16 9.97 < all-int8 12.46 — the y1 requantize
epilogue (per-chunk max-reduce + round/clip on the VPU) costs more
than int8's conv2 dot-rate gain, while int8 conv1 is pure gain (its
x-quantize is XLA-side and the weight-scale dequant folds into the BN
affine).  Stage bisect: conv1 ~3.4-3.6 (incl. input streaming + VPU
affine), conv2 bf16 4.27 = 97% of bf16 peak, pool 0.6; tc=48 optimal
in every mode (32/64 worse, probe_block1_{bf16,mixed}).  CLOSED: a
dense-K=576 per-parity conv2 layout would force N=64 dots (half-empty
MXU), so the 75%-dense K=768 dot is structurally right — each stage
sits at a measured floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    _quant_i8,
    fold_bn,
)

__all__ = ["fused_block1_pair", "fold_bn"]

_M = 64  # Cnn8Rnn mel bins; the banded weights are built for this width


def _conv1_w(w1: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, 1, C] HWIO -> [3M, (M+2)*C] banded: the operand row for
    output time t is ``[X[t-1] | X[t] | X[t+1]]``; K = M*dt + mel_in,
    N = C*(m_out + 1) + c; entry = w1[dt, mel_in - m_out + 1, c] inside
    the band — band truncation at the matrix edge IS the conv's mel
    zero-padding.  N carries one zero C-block on each side (the
    "m_out = -1 / M" pads) so every mel pair's conv2 K-window is a
    contiguous, 128-aligned 4C lane slice of the accumulator."""
    m = _M
    w = jnp.asarray(w1[:, :, 0, :], jnp.float32)        # [3, 3, C]
    c = w.shape[-1]
    wk = jnp.zeros((3, m, m, c), jnp.float32)
    mo = jnp.arange(m)
    for dm in range(3):
        mi = mo + dm - 1
        ok = ((mi >= 0) & (mi < m)).astype(jnp.float32)[:, None]
        mi_c = jnp.clip(mi, 0, m - 1)
        for dt in range(3):
            wk = wk.at[dt, mi_c, mo, :].add(ok * w[dt, dm][None, :])
    return jnp.pad(wk.reshape(3 * m, m * c), ((0, 0), (c, c)))


def _conv2_w(w2: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, C] HWIO -> [12C, 2C]: ONE K=12C matrix over
    (dt, h, ci) -> (p_out, co), where h indexes the 4 mel half-blocks
    of a pair's contiguous conv2 window ``[o[r-1] | e[r] | o[r] |
    e[r+1]]`` (mel 2r-1+h); the mel tap it realizes for output parity
    p_out is dm = h - p_out.  9 of the 12 (CxC) blocks per output
    parity carry weights (75% band density)."""
    w = jnp.asarray(w2, jnp.float32)
    ci, co = w.shape[2], w.shape[3]
    blocks = jnp.zeros((3, 4, ci, 2, co), jnp.float32)
    for dt in range(3):
        for h in range(4):
            for po in range(2):
                dm = h - po
                if 0 <= dm <= 2:
                    blocks = blocks.at[dt, h, :, po, :].set(w[dt, dm])
    return blocks.reshape(12 * ci, 2 * co)


def _perm(mp: int) -> list:
    """Block order: even mel pairs first, then odd — so pooled rows
    group as (r%2, quad) and the output store is two lane-half ops."""
    return list(range(0, mp, 2)) + list(range(1, mp, 2))


def _kernel(xw_ref, w1_ref, w2_ref, ab1_ref, ab2_ref, sx_ref,
            out_ref, xc_ref, y9_ref, *, tc: int, c: int, t_real: int,
            tp: int, q1: bool, q2: bool, stages: int = 4):
    """Grid = (batch, time chunks of tc output frames).

    xw: [1, Tp+2, 3M] three-tap packed input (resident per clip).
    xc: this chunk's [tc+2, 3M] window (one tiny dynamic-offset copy).
    y9: flat [mp*tc, 12C] conv2 operand — row (r, i) holds the pair's
    contiguous 4C mel window at the three time taps
    ``[win(r)@t-1 | win(r)@t | win(r)@t+1]``.
    ab1: [2, (M+2)*C] f32 tiled conv1 BN affine (int8 weight scales
    folded); ab2: [2, 2C]; sx: [b, 1] SMEM per-clip input scales.
    """
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    mp = _M // 2
    rows1 = tc + 2                    # conv1 time rows (with halo)
    rowsf = mp * tc                   # flat conv2 rows (no halo)
    acc1_dtype = jnp.int32 if q1 else jnp.float32
    acc2_dtype = jnp.int32 if q2 else jnp.float32
    perm = _perm(mp)

    # stage this chunk's packed-input window (tiny: [tc+2, 192])
    xc_ref[...] = xw_ref[0, pl.ds(j * tc, rows1)]

    # ---- conv1: ONE banded K=3M dot -> [tc+2, (M+2)*C] ----
    acc1 = jax.lax.dot_general(
        xc_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc1_dtype)

    if stages <= 0:   # probe ablation: conv1 dot only, no epilogue
        out_ref[0, 0, :, :] = acc1[:tc // 2, :2 * c].astype(out_ref.dtype)
        return

    if q1:
        a1 = ab1_ref[0:1] * sx_ref[pl.program_id(0), 0]
    else:
        a1 = ab1_ref[0:1]
    y1f = acc1.astype(jnp.float32) * a1 + ab1_ref[1:2]
    if q2:
        # the lower quantization clip realizes the ReLU (pad columns
        # carry a = b = 0, so they stay exactly zero)
        sy = jnp.maximum(jnp.max(y1f), 1e-6) / 127.0
        y1v = jnp.clip(jnp.round(y1f * (1.0 / sy)), 0.0, 127.0).astype(
            jnp.int8)
    else:
        sy = 1.0
        y1v = jnp.maximum(y1f, 0.0).astype(y9_ref.dtype)

    if stages <= 1:   # probe ablation: conv1 only
        out_ref[0, 0, :, :] = y1v[:tc // 2, :2 * c].astype(out_ref.dtype)
        return

    # ---- triple-store into the flat y9 (registers -> VMEM): each
    # store is a 128-aligned 4C lane window x a dt-shifted row slice
    for b, r in enumerate(perm):
        for dt in range(3):
            y9_ref[b * tc:(b + 1) * tc,
                   4 * c * dt:4 * c * (dt + 1)] = (
                y1v[dt:dt + tc, 2 * c * r:2 * c * r + 4 * c])

    @pl.when(j == 0)
    def _():
        # the dt=0 tap of output t=0 reads y1[t=-1]: conv zero-pad
        for b in range(mp):
            y9_ref[b * tc:b * tc + 1, 0:4 * c] = jnp.zeros(
                (1, 4 * c), y9_ref.dtype)

    # taps at t >= t_real must read as conv zero-pad too: the last KEPT
    # output (t = 2*(t_real//2) - 1) taps y1[t_real] when t_real is even
    for dt in range(3):
        zs = t_real - (tp - tc) + 1 - dt   # first padded row, last chunk
        if zs < tc:
            @pl.when(j == tp // tc - 1)
            def _(dt=dt, zs=max(zs, 0)):
                for b in range(mp):
                    y9_ref[b * tc + zs:(b + 1) * tc,
                           4 * c * dt:4 * c * (dt + 1)] = jnp.zeros(
                        (tc - zs, 4 * c), y9_ref.dtype)

    if stages <= 2:   # probe ablation: conv1 + triple-store only
        out_ref[0, 0, :, :] = y1v[:tc // 2, :2 * c].astype(out_ref.dtype)
        return

    # ---- conv2: ONE K=12C dot over the flat layout ----
    acc2 = jax.lax.dot_general(
        y9_ref[...], w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc2_dtype)

    a2 = ab2_ref[0:1] * sy if q2 else ab2_ref[0:1]
    y2 = jnp.maximum(acc2.astype(jnp.float32) * a2 + ab2_ref[1:2], 0.0)
    # pool in the output dtype (bf16 in both serving modes): halves the
    # bytes of the reshape/lane-half chain vs pooling in f32
    y2 = y2.astype(out_ref.dtype)

    if stages <= 3:   # probe ablation: skip pool + packed out stores
        out_ref[0, 0, :, :] = y2[:tc // 2].astype(out_ref.dtype)
        return

    # pool: time pairs via the row-merge reshape (rows are (r, i) with
    # i t-aligned and tc even — no garbage rows), mel pairs via the
    # (p, c) lane halves
    v = y2.reshape(rowsf // 2, 4 * c)
    s = v[:, :2 * c] + v[:, 2 * c:]
    mx = jnp.maximum(v[:, :2 * c], v[:, 2 * c:])
    pooled = (s[:, :c] + s[:, c:]) * 0.25 + jnp.maximum(
        mx[:, :c], mx[:, c:])                       # [(r%2, q, t'), c]

    # block2's packed lane order: out[q, t', (r%2)*c + c_out]
    v4 = pooled.reshape(2, mp // 2, tc // 2, c).astype(out_ref.dtype)
    out_ref[0, :, :, 0:c] = v4[0]
    out_ref[0, :, :, c:2 * c] = v4[1]


def _kernel_single(xw_ref, w1_ref, w2_ref, ab1_ref, ab2_ref, sx_ref,
                   out_ref, xc_ref, y5_ref, *, tc: int, c: int,
                   t_real: int, tp: int, q1: bool, q2: bool):
    """Single-store variant (round 5): y1 is stored ONCE per mel-pair
    block as a flat ``[mp*(tc+4), 4C]`` halo layout (local row l of
    block r holds y1[t = j*tc - 2 + l, win(r)]; halo 2 rows on each
    side keeps the pool's row-merge reshape pair-aligned), and conv2
    runs as THREE acc-chained global-row-offset dots with K=4C=256
    (the free static-sublane-offset trick) instead of one K=12C dot
    over a triple-stored operand.  Trade measured on-chip: ~3x less
    VPU store traffic vs a lower int8 dot rate at K=256 (157 vs 240
    TOP/s, scripts/probe_nk_matrix.py).
    """
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    mp = _M // 2
    rows_b = tc + 4                   # rows per mel-pair block (halo 2+2)
    rt = mp * rows_b                  # flat conv2 rows
    off = 8                           # front pad rows of y5 (dt-1 slice)
    acc1_dtype = jnp.int32 if q1 else jnp.float32
    acc2_dtype = jnp.int32 if q2 else jnp.float32
    perm = _perm(mp)

    # stage this chunk's packed-input window ([tc+4, 192]; row v of xw
    # is [X[v-3] | X[v-2] | X[v-1]] so y1 time = j*tc - 2 + local row)
    xc_ref[...] = xw_ref[0, pl.ds(j * tc, rows_b)]

    # ---- conv1: ONE banded K=3M dot -> [tc+4, (M+2)*C] ----
    acc1 = jax.lax.dot_general(
        xc_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc1_dtype)
    if q1:
        a1 = ab1_ref[0:1] * sx_ref[pl.program_id(0), 0]
    else:
        a1 = ab1_ref[0:1]
    y1f = acc1.astype(jnp.float32) * a1 + ab1_ref[1:2]
    if q2:
        sy = jnp.maximum(jnp.max(y1f), 1e-6) / 127.0
        y1v = jnp.clip(jnp.round(y1f * (1.0 / sy)), 0.0, 127.0).astype(
            jnp.int8)
    else:
        sy = 1.0
        y1v = jnp.maximum(y1f, 0.0).astype(y5_ref.dtype)

    # ---- single store per mel-pair block: the pair's contiguous 4C
    # lane window, all tc+4 halo rows ----
    for b, r in enumerate(perm):
        y5_ref[off + b * rows_b:off + (b + 1) * rows_b, :] = (
            y1v[:, 2 * c * r:2 * c * r + 4 * c])

    @pl.when(j == 0)
    def _():
        # the dt-slice pad rows must be finite (f32 mode reads them
        # into discarded outputs), and y1[t=-1] is conv zero-pad
        y5_ref[0:off, :] = jnp.zeros((off, 4 * c), y5_ref.dtype)
        y5_ref[off + rt:off + rt + off, :] = jnp.zeros(
            (off, 4 * c), y5_ref.dtype)
        for b in range(mp):
            y5_ref[off + b * rows_b + 1:off + b * rows_b + 2, :] = (
                jnp.zeros((1, 4 * c), y5_ref.dtype))

    # rows at t >= t_real read as conv zero-pad (the affine's BN bias
    # makes padded-input conv rows nonzero otherwise); only the last
    # chunk's rows feed KEPT outputs (earlier chunks' trailing halo
    # rows only reach outputs the final [:t//2] trim discards)
    zs = t_real - (tp - tc) + 2       # first local row past the clip
    if zs < rows_b:
        @pl.when(j == tp // tc - 1)
        def _(zs=max(zs, 0)):
            for b in range(mp):
                y5_ref[off + b * rows_b + zs:off + (b + 1) * rows_b,
                       :] = jnp.zeros((rows_b - zs, 4 * c), y5_ref.dtype)

    # ---- conv2: three acc-chained K=4C dots at global row offsets
    # (output local row m of block r = out time j*tc + m - 2; tap dt
    # reads local row m + dt - 1 — block-edge rows yield garbage
    # outputs that the pool slice discards) ----
    acc2 = jax.lax.dot_general(
        y5_ref[off - 1:off - 1 + rt], w2_ref[0:4 * c],
        (((1,), (0,)), ((), ())), preferred_element_type=acc2_dtype)
    acc2 = acc2 + jax.lax.dot_general(
        y5_ref[off:off + rt], w2_ref[4 * c:8 * c],
        (((1,), (0,)), ((), ())), preferred_element_type=acc2_dtype)
    acc2 = acc2 + jax.lax.dot_general(
        y5_ref[off + 1:off + 1 + rt], w2_ref[8 * c:12 * c],
        (((1,), (0,)), ((), ())), preferred_element_type=acc2_dtype)

    a2 = ab2_ref[0:1] * sy if q2 else ab2_ref[0:1]
    y2 = jnp.maximum(acc2.astype(jnp.float32) * a2 + ab2_ref[1:2], 0.0)
    y2 = y2.astype(out_ref.dtype)

    # pool: time pairs via the row-merge reshape (rows_b is even, so
    # pairs never cross blocks; the first and last pair of each block
    # are halo garbage), mel pairs via the (p, c) lane halves
    v = y2.reshape(rt // 2, 4 * c)
    s = v[:, :2 * c] + v[:, 2 * c:]
    mx = jnp.maximum(v[:, :2 * c], v[:, 2 * c:])
    pooled = (s[:, :c] + s[:, c:]) * 0.25 + jnp.maximum(
        mx[:, :c], mx[:, c:])                  # [(r%2, q, pair), c]

    v4 = pooled.reshape(2, mp // 2, rows_b // 2, c)[
        :, :, 1:tc // 2 + 1, :].astype(out_ref.dtype)
    out_ref[0, :, :, 0:c] = v4[0]
    out_ref[0, :, :, c:2 * c] = v4[1]


def fused_block1_pair(x: jax.Array, w1: jax.Array, ab1: tuple,
                      w2: jax.Array, ab2: tuple, *,
                      quantize: bool | str = False, tc: int = 48,
                      compute_dtype: jnp.dtype = jnp.bfloat16,
                      interpret: bool | None = None, mode: str = "triple",
                      _stages: int = 4, _raw_out: bool = False) -> jax.Array:
    """Fused (conv3x3->BN->ReLU)x2 -> dual 2x2 pool for Cin=1, M=64.

    x: ``[B, T, 64]`` bn0-applied log-mel (reference
    models/audio_encoder.py:188-198: bn0 precedes block1); w1
    ``[3, 3, 1, C]``, w2 ``[3, 3, C, C]`` HWIO with C = 64; ab:
    ``(a, b)`` folded BN affines (:func:`fold_bn`).  Returns
    ``[B, T//2, 32, C]``.  Serving only (running BN stats).

    ``quantize``: ``False`` = all-``compute_dtype``; ``True`` = int8
    operands on both conv dots (per-clip input scale, per-chunk y1
    requantize); ``"conv1"`` = MIXED — int8 conv1 dot (the x quantize
    is XLA-side and the weight-scale dequant folds into the BN affine)
    feeding a ``compute_dtype`` conv2, skipping the per-chunk y1
    requantize epilogue entirely (the round-5 bisect found that
    epilogue is what made all-int8 lose to bf16 at this geometry).
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
            lambda x_, w1_, a1, b1, w2_, a2, b2: fused_block1_pair(
                x_, w1_, (a1, b1), w2_, (a2, b2), quantize=quantize,
                tc=tc, compute_dtype=compute_dtype, interpret=interpret,
                mode=mode),
            (x, w1, *ab1, w2, *ab2),
            (0, None, None, None, None, None, None))
    if mode not in ("triple", "single"):
        raise ValueError(f"unknown block1 pair mode: {mode!r}")
    if isinstance(quantize, str):
        if quantize != "conv1":
            raise ValueError(f"unknown quantize mode: {quantize!r}")
    else:
        # normalize truthy/falsy (e.g. 1) to the historical bool contract
        quantize = bool(quantize)
    q1 = quantize in (True, "conv1")  # int8 conv1 dot (x + w1 int8)
    q2 = quantize is True             # int8 conv2 dot (y1 requantized)

    b, t, m = x.shape
    if m != _M:
        raise ValueError(f"block1 pair kernel is built for M=64, got {m}")
    c = w1.shape[-1]
    if c != 64 or w2.shape[2] != c or w2.shape[3] != c:
        raise ValueError("block1 pair kernel expects 64 channels")
    if tc % 16 or _M // 2 * (tc + 2) > 2200:
        raise ValueError(f"invalid tc={tc}")
    mp = _M // 2
    tp = -(-t // tc) * tc                            # padded frame count

    w1p = _conv1_w(w1)
    w2p = _conv2_w(w2)
    a1, b1 = (jnp.asarray(v, jnp.float32) for v in ab1)
    a2, b2 = (jnp.asarray(v, jnp.float32) for v in ab2)
    a1t = jnp.pad(jnp.tile(a1, m), (c, c))   # zero affine on the N pads
    b1t = jnp.pad(jnp.tile(b1, m), (c, c))
    if q1:
        s1 = jnp.maximum(jnp.max(jnp.abs(w1p), axis=0), 1e-8) / 127.0
        a1t = a1t * s1
        w1p = _quant_i8(w1p, 1.0 / s1[None])
    else:
        w1p = w1p.astype(compute_dtype)
    if q2:
        s2 = jnp.maximum(jnp.max(jnp.abs(w2p), axis=0), 1e-8) / 127.0
        a2t = jnp.tile(a2, 2) * s2
        w2p = _quant_i8(w2p, 1.0 / s2[None])
    else:
        a2t = jnp.tile(a2, 2)
        w2p = w2p.astype(compute_dtype)
    ab1v = jnp.stack([a1t, b1t])
    ab2v = jnp.stack([a2t, jnp.tile(b2, 2)])

    # three-tap lane packing, built XLA-side (int8-early so the pad +
    # concat copies move 1-byte lanes): xw[v] = [X[v-2] | X[v-1] | X[v]]
    # (triple mode; single mode shifts one row earlier so chunk j's
    # conv1 rows cover y1 times j*tc-2 .. j*tc+tc-1)
    if q1:
        sx = jnp.maximum(jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True),
                         1e-6) / 127.0
        xq = _quant_i8(x.astype(jnp.float32), 1.0 / sx)
        sxv = sx.reshape(b, 1).astype(jnp.float32)
    else:
        xq = x.astype(compute_dtype)
        sxv = jnp.ones((b, 1), jnp.float32)
    front = 2 if mode == "triple" else 3
    xwr = tp + 2 if mode == "triple" else tp + 4    # xw rows
    xz = jnp.pad(xq, ((0, 0), (front, xwr - t - front + 2), (0, 0)))
    xw = jnp.concatenate(
        [xz[:, :xwr], xz[:, 1:xwr + 1], xz[:, 2:xwr + 2]], axis=-1)

    in_dtype = jnp.int8 if q1 else compute_dtype     # xw / xc lanes
    y_dtype = jnp.int8 if q2 else compute_dtype      # y1 scratch lanes
    if mode == "single":
        rows1 = tc + 4
        kern = functools.partial(_kernel_single, tc=tc, c=c, t_real=t,
                                 tp=tp, q1=q1, q2=q2)
        scratch2 = pltpu.VMEM((mp * rows1 + 16, 4 * c), y_dtype)    # y5
    else:
        rows1 = tc + 2
        kern = functools.partial(_kernel, tc=tc, c=c, t_real=t, tp=tp,
                                 q1=q1, q2=q2, stages=_stages)
        scratch2 = pltpu.VMEM((mp * tc, 12 * c), y_dtype)           # y9
    out = pl.pallas_call(
        kern,
        grid=(b, tp // tc),
        in_specs=[
            pl.BlockSpec((1, xwr, 3 * m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, (m + 2) * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2 * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, mp // 2, tc // 2, 2 * c),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, mp // 2, tp // 2, 2 * c),
            jnp.bfloat16 if q2 else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows1, 3 * m), in_dtype),               # xc
            scratch2,                                           # y9 / y5
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xw, w1p, w2p, ab1v, ab2v, sxv)
    if _raw_out:
        return out
    # (quad, time) -> (time, quad); then [B, T', 16, 2C] == the packed
    # [B, T', 32, C] block2 layout bit-for-bit
    out = out.transpose(0, 2, 1, 3)[:, :t // 2]
    return out.reshape(b, t // 2, m // 2, c)
