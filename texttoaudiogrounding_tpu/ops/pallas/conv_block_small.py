"""Fused Pallas kernels for the SMALL-channel PANNs blocks (Cnn8Rnn
blocks 1-2) — the round-2 open frontier.

Round-2 designs for these blocks (direct9, mel-im2col K=3C, mel-pair
banded K=6C) all lost to XLA because 64-channel geometry either starves
the MXU's K dim (int8 needs K >= 256 to double-pump) or wastes half of
every dot on banded-zero weights.  This module wins them back on the
mel-PAIR-packed layout (rows = (t, mel-pair j), lanes = (mel parity p,
channel c)) with aligned-window dots:

* **Dense parity-slice dots** (Cin = 128: block2 conv2): the 3-copy
  mel staging ``z[r] = [y(j-1) | y(j) | y(j+1)]`` is 3*256 = 768 lanes;
  output parity p needs the contiguous mel window ``[(1+p)*128,
  (4+p)*128)`` — both windows 128-aligned, so the conv runs as 6 dense
  int8 dots ``[rows, 384] x [384, 128]`` with ZERO banded waste.
* **Windowed-parity dots** (Cin = 64: block2 conv1): each parity's
  192-lane window is 64-misaligned; widening to the enclosing aligned
  256-lane window costs 25% zero-K (vs 50% for round-2's banded
  layout) and K = 256 still int8-double-pumps.
* **Banded dots** (Cin = Cout = 64: block1 conv2): per-parity windows
  would give N = 64 half-lane dots, so the two parities share one
  K = 384 dot with 50%-banded weights — N stays 128 and int8's 2x
  absorbs the waste.

Block1's conv1 (Cin=1, K=9) is not MXU work: the caller prestages a
tiny ``[B, T*mp, 16]`` im2col XLA-side (12 real taps: the 4 mels
covering both parities x 3 time taps; ~130 MB vs ~1 GB for the conv1
activation in HBM) and the kernel folds it in as one K=16 bf16 dot.

Reference semantics: PANNs ConvBlock conv3x3(SAME)->BN->ReLU x2 ->
'avg+max' pool(2,2) (reference models/panns.py:20-62); serving path
only (running BN stats folded to per-channel affines via fold_bn).

VERDICT (round 3, on-chip, scripts/bench_block2_pair.py +
sweep_conv_block.py): **CLOSED — superseded, UNROUTED.**  Block2 fused
int8 measures 8.54-8.82 ms vs XLA bf16's 8.42 (a tie; banded 9.28
worse), block1 19.5-21.9 vs XLA's 10.63 (2x worse: the [*, 16]-lane
im2col layout + a K=16 dot are both MXU-hostile).  The ~4 ms/block of
serialized VPU staging is structural to every im2col-style design
(scripts/probe_dma_window.py closed async-DMA hiding too).  Production
routes ``conv_block_pair.py`` (block2, 7.59 ms — static sublane-offset
slices need NO staged windows) and ``conv_block1_pair.py`` (block1).
Kept in-tree as the measured record of why staged-window designs lose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block import _quant_i8


def _parity_windows(c0: int):
    """Aligned K-window [lo, hi) per output parity over the 3-group
    staging buffer (width 3*2*c0, groups mel-ascending).  Parity p
    needs staged mel lanes [(1+p)*c0, (4+p)*c0); round out to 128."""
    wins = []
    for p in range(2):
        lo = (1 + p) * c0
        hi = (4 + p) * c0
        wins.append((lo // 128 * 128, -(-hi // 128) * 128))
    return wins


# --------------------------------------------------------------------------
# Host-side weight preparation
# --------------------------------------------------------------------------


def _np_w(w):
    return np.asarray(jax.device_get(w), np.float32)


def _quant_rows(mat: np.ndarray, scales: np.ndarray) -> np.ndarray:
    return np.clip(np.round(mat / scales[None]), -127, 127).astype(np.int8)


def _w_scales(w: np.ndarray) -> np.ndarray:
    """Per-output-channel symmetric int8 scale over all 9 taps."""
    return np.maximum(np.max(np.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0


def _parity_weight(w: np.ndarray, win: tuple, p: int) -> np.ndarray:
    """Dense per-parity window weight [3*(hi-lo), Cout]: 3 time taps
    stacked; window row k = staged lane ``lo + k`` = mel offset
    ``(lo+k)//c0 - 1 - p`` (in [0,3) = active), channel ``(lo+k)%c0``."""
    _, _, c0, cout = w.shape
    lo, hi = win
    mats = []
    for dt in range(3):
        m = np.zeros((hi - lo, cout), np.float32)
        for k in range(lo, hi):
            dm = k // c0 - 1 - p
            if 0 <= dm <= 2:
                m[k - lo] = w[dt, dm, k % c0]
        mats.append(m)
    return np.concatenate(mats, axis=0)


def _banded_weight(w: np.ndarray) -> np.ndarray:
    """Banded pair weight [3*6*Cin, 2*Cout], mel-ascending groups: K row
    (dt, g, q, c) is active for output (p, co) iff the group's mel
    offset ``2*(g-1) + q - p`` lies in the 3x3 stencil."""
    _, _, cin, cout = w.shape
    out = []
    for dt in range(3):
        wb = np.zeros((3, 2, cin, 2, cout), np.float32)
        for g in range(3):
            for q in range(2):
                for p in range(2):
                    dm = 2 * (g - 1) + q - p + 1
                    if 0 <= dm <= 2:
                        wb[g, q, :, p] = w[dt, dm]
        out.append(wb.reshape(6 * cin, 2 * cout))
    return np.concatenate(out, axis=0)


def _conv1_w16(w1) -> np.ndarray:
    """Block1 conv1 weight [16, 2*Cout] for the prestaged im2col dot:
    K row (dt, dm4) with dm4 the mel position in the 4-mel window
    (2j-1 .. 2j+2); output lane (p, cout) uses dm = dm4 - p."""
    w = _np_w(w1)                       # [3, 3, 1, cout]
    cout = w.shape[3]
    mat = np.zeros((16, 2 * cout), np.float32)
    for dt in range(3):
        for dm4 in range(4):
            for p in range(2):
                dm = dm4 - p
                if 0 <= dm <= 2:
                    mat[dt * 4 + dm4, p * cout:(p + 1) * cout] = \
                        w[dt, dm, 0]
    return mat


# --------------------------------------------------------------------------
# Kernel-side staging helpers
# --------------------------------------------------------------------------


def _stage3(dst_ref, src_ref, rows: int, mp: int, width: int):
    """Mel-ascending 3-group staging with pair-edge masks:
    ``dst[r] = [src[r] | src[r+1] | src[r+2]]`` where src carries a
    1-row lead pad (so group g holds pair j + g - 1) and dst row r has
    pair index ``r % mp``."""
    melp = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % mp
    zero = jnp.zeros((), src_ref.dtype)
    dst_ref[:, 0:width] = jnp.where(melp != 0, src_ref[0:rows], zero)
    dst_ref[:, width:2 * width] = src_ref[1:rows + 1]
    dst_ref[:, 2 * width:3 * width] = jnp.where(
        melp != mp - 1, src_ref[2:rows + 2], zero)


def _time_pool(s, mx, rows2: int, mp: int, c: int):
    """Dual-pool time pairs on flat (t, j) rows via the middle-dim
    reshape trick (strided gathers fail to lower on Mosaic)."""
    vs = s.reshape(rows2 // (2 * mp), 2 * mp, c)
    vm = mx.reshape(rows2 // (2 * mp), 2 * mp, c)
    s = (vs[:, :mp] + vs[:, mp:]).reshape(rows2 // 2, c)
    mx = jnp.maximum(vm[:, :mp], vm[:, mp:]).reshape(rows2 // 2, c)
    return s, mx


# --------------------------------------------------------------------------
# Block2 kernel: [B, T, 32, 64] -> [B, T/2, 16, 128]
# --------------------------------------------------------------------------


def _block2_kernel(x_ref, w1a_ref, w1b_ref, w2_ref, ab_ref, out_ref,
                   xp_ref, xc_ref, z1_ref, z2_ref, *, t: int,
                   t_grid: int, mp: int, c0: int, cout: int, tc: int,
                   quantize: bool, wins: tuple):
    """Grid = (batch, chunks of tc).  conv1 = windowed-parity dots
    (K=256 for c0=64), conv2 = dense parity-slice dots (K=3*cout).
    ab_ref: [4, 2*cout] = (a1, b1, a2, b2) tiled per parity; int8
    weight scales pre-folded into a1/a2, dynamic activation scales
    multiplied in-kernel."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    lanes = 2 * c0
    rows1 = (tc + 2) * mp           # conv1 out rows: times [t0-1, t0+tc+1)
    rows2 = tc * mp                 # conv2 out rows: times [t0, t0+tc)
    rows_z = (tc + 4) * mp          # z1 rows:        times [t0-2, t0+tc+2)

    @pl.when(j == 0)
    def _():
        xp_ref[0:2 * mp + 1] = jnp.zeros((2 * mp + 1, lanes), xp_ref.dtype)
        xp_ref[pl.ds(2 * mp + 1, t_grid * mp)] = x_ref[0]
        xp_ref[pl.ds((t_grid + 2) * mp + 1, 2 * mp + 1)] = jnp.zeros(
            (2 * mp + 1, lanes), xp_ref.dtype)

    acc_dtype = jnp.int32 if quantize else jnp.float32
    t0 = j * tc

    # chunk input window: 1 pair-pad lead row + rows_z + 1 trail row
    xc_ref[...] = xp_ref[pl.ds(j * rows2, rows_z + 2)]

    if quantize:
        s1 = jnp.maximum(jnp.max(jnp.abs(
            xc_ref[...].astype(jnp.float32))), 1e-6) / 127.0
    else:
        s1 = 1.0

    # ---- conv1: stage z1 then windowed-parity dots ----
    melp = jax.lax.broadcasted_iota(jnp.int32, (rows_z, 1), 0) % mp
    zero = jnp.zeros((), xc_ref.dtype)
    left = jnp.where(melp != 0, xc_ref[0:rows_z], zero)
    center = xc_ref[1:rows_z + 1]
    right = jnp.where(melp != mp - 1, xc_ref[2:rows_z + 2], zero)
    if quantize:
        inv1 = 1.0 / s1
        left, center, right = (_quant_i8(v.astype(jnp.float32), inv1)
                               for v in (left, center, right))
    z1_ref[:, 0:lanes] = left
    z1_ref[:, lanes:2 * lanes] = center
    z1_ref[:, 2 * lanes:3 * lanes] = right

    trow1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // mp
    tval1 = ((trow1 + (t0 - 1)) >= 0) & ((trow1 + (t0 - 1)) < t)
    sy = 1.0
    y1_parts = []
    for p, w_ref in enumerate((w1a_ref, w1b_ref)):
        lo, hi = wins[p]
        k = hi - lo
        acc = jnp.zeros((rows1, cout), acc_dtype)
        for dt in range(3):
            acc = acc + jax.lax.dot_general(
                z1_ref[dt * mp:dt * mp + rows1, lo:hi],
                w_ref[dt * k:(dt + 1) * k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        af = ab_ref[0:1, p * cout:(p + 1) * cout] * s1
        bf = ab_ref[1:2, p * cout:(p + 1) * cout]
        y1_parts.append(jnp.where(tval1, jnp.maximum(
            acc.astype(jnp.float32) * af + bf, 0.0), 0.0))

    if quantize:
        sy = jnp.maximum(jnp.maximum(jnp.max(y1_parts[0]),
                                     jnp.max(y1_parts[1])), 1e-6) / 127.0
        invy = 1.0 / sy
        y1_parts = [_quant_i8(v, invy) for v in y1_parts]
    else:
        sy = 1.0
        y1_parts = [v.astype(z2_ref.dtype) for v in y1_parts]

    # ---- conv2: dense parity-slice dots over the staged y1 ----
    # z2 (3 mel-ascending groups of (p0|p1)) is built by DIRECT masked
    # stores of the register-resident y1 values into the shifted group
    # slots — no y1 ref round-trip (ref-to-ref staging copies measured
    # ~2x the cost of stores)
    zv = jnp.zeros((1, cout), z2_ref.dtype)
    mk = (jax.lax.broadcasted_iota(jnp.int32, (rows1 - 1, 1), 0)
          + 1) % mp != 0
    for p, qp in enumerate(y1_parts):
        c = p * cout
        # center group: y1[r]
        z2_ref[0:rows1, 2 * cout + c:2 * cout + c + cout] = qp
        # left group: y1[r-1], zero at pair edge melp(dst)==0
        z2_ref[0:1, c:c + cout] = zv
        z2_ref[1:rows1, c:c + cout] = jnp.where(mk, qp[0:rows1 - 1], 0)
        # right group: y1[r+1], zero at pair edge melp(dst)==mp-1
        z2_ref[0:rows1 - 1, 4 * cout + c:4 * cout + c + cout] = \
            jnp.where(mk, qp[1:rows1], 0)
        z2_ref[rows1 - 1:rows1, 4 * cout + c:4 * cout + c + cout] = zv
    y2_parts = []
    for p in range(2):
        lo = (1 + p) * cout
        acc = jnp.zeros((rows2, cout), acc_dtype)
        for dt in range(3):
            acc = acc + jax.lax.dot_general(
                z2_ref[dt * mp:dt * mp + rows2, lo:lo + 3 * cout],
                w2_ref[dt * 3 * cout:(dt + 1) * 3 * cout],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype)
        af = ab_ref[2:3, p * cout:(p + 1) * cout] * sy
        bf = ab_ref[3:4, p * cout:(p + 1) * cout]
        y2_parts.append(jnp.maximum(
            acc.astype(jnp.float32) * af + bf, 0.0))

    # ---- dual pool: mel pairs = parity values, time pairs = rows ----
    s = (y2_parts[0] + y2_parts[1]) * 0.25
    mx = jnp.maximum(y2_parts[0], y2_parts[1])
    s, mx = _time_pool(s, mx, rows2, mp, cout)
    out_ref[0] = (s + mx).astype(out_ref.dtype)


def fused_block2(x: jax.Array, w1, ab1, w2, ab2, *,
                 quantize: bool = True, tc: int | None = None,
                 compute_dtype=jnp.bfloat16, conv1: str = "banded",
                 interpret: bool = False) -> jax.Array:
    """Pair-dense fused PANNs block for Cin=64 -> Cout=128, pool (2,2).

    x: ``[B, T, M, 64]`` (M even); returns ``[B, T//2, M//2, 128]``.
    T may be odd (the trailing time row is dropped by the floor pool,
    matching torch); internally T is padded to the chunk grid and
    tval-masked.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, cin = x.shape
    cout = w2.shape[-1]
    assert cin == 64 and m % 2 == 0
    mp = m // 2

    # chunk layout: tc divides the padded grid length
    t_out = t // 2
    if tc is None:
        tc = 50 if t_out % 25 == 0 else 2
    t_grid = -(-t // tc) * tc
    if t_grid != t:
        x = jnp.pad(x, ((0, 0), (0, t_grid - t), (0, 0), (0, 0)))

    xf = x.reshape(b, t_grid * mp, 2 * cin).astype(compute_dtype)

    w1np, w2np = _np_w(w1), _np_w(w2)
    if conv1 == "banded":
        # full-width K=6*cin dots with per-parity half-banded weights
        # (measured: int8 K=384 runs ~278 TOP/s vs ~157 at K=256, which
        # more than pays for the 50% banded-zero rows)
        wins = ((0, 6 * cin), (0, 6 * cin))
        wb = _banded_weight(w1np)            # [3*6*cin, 2*cout]
        k6 = 6 * cin
        w1a = np.concatenate([wb[dt * k6:(dt + 1) * k6, :cout]
                              for dt in range(3)], axis=0)
        w1b = np.concatenate([wb[dt * k6:(dt + 1) * k6, cout:]
                              for dt in range(3)], axis=0)
    else:
        wins = tuple(_parity_windows(cin))
        w1a = _parity_weight(w1np, wins[0], 0)
        w1b = _parity_weight(w1np, wins[1], 1)
    w2f = np.concatenate(
        [w2np[dt].reshape(3 * cout, cout) for dt in range(3)], axis=0)

    a1, bb1 = (jnp.asarray(v, jnp.float32) for v in ab1)
    a2, bb2 = (jnp.asarray(v, jnp.float32) for v in ab2)
    if quantize:
        s1 = _w_scales(w1np)
        s2 = _w_scales(w2np)
        w1a = _quant_rows(w1a, s1)
        w1b = _quant_rows(w1b, s1)
        w2f = _quant_rows(w2f, s2)
        a1 = a1 * s1
        a2 = a2 * s2
        wdtype = jnp.int8
    else:
        wdtype = compute_dtype
    ab = jnp.stack([jnp.concatenate([v] * 2) for v in
                    (a1, bb1, a2, bb2)]).astype(jnp.float32)

    rows1 = (tc + 2) * mp
    rows_z = (tc + 4) * mp
    q_dtype = jnp.int8 if quantize else compute_dtype

    kern = functools.partial(_block2_kernel, t=t, t_grid=t_grid, mp=mp,
                             c0=cin, cout=cout, tc=tc, quantize=quantize,
                             wins=tuple(wins))
    out = pl.pallas_call(
        kern,
        grid=(b, t_grid // tc),
        in_specs=[
            pl.BlockSpec((1, t_grid * mp, 2 * cin), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1a.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1b.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, (tc // 2) * mp, cout), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (t_grid // 2) * mp, cout),
            jnp.bfloat16 if quantize else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM(((t_grid + 4) * mp + 2, 2 * cin),
                       compute_dtype),                         # xp
            pltpu.VMEM((rows_z + 2, 2 * cin), compute_dtype),  # xc
            pltpu.VMEM((rows_z, 6 * cin), q_dtype),            # z1
            pltpu.VMEM((rows1, 6 * cout), q_dtype),            # z2
        ],
        interpret=interpret,
    )(xf, jnp.asarray(w1a, wdtype), jnp.asarray(w1b, wdtype),
      jnp.asarray(w2f, wdtype), ab)
    return out.reshape(b, t_grid // 2, mp, cout)[:, :t_out]


# --------------------------------------------------------------------------
# Block1 kernel: logmel [B, T, 64] (post-bn0) -> [B, T/2, 32, 64]
# --------------------------------------------------------------------------


def conv1_im2col(x_mel: jax.Array, t_grid: int) -> jax.Array:
    """[B, T, M] -> [B, t_grid * mp, 16] block1-conv1 im2col.

    Row (t, j) carries the 12 taps feeding BOTH parities of mel pair j:
    mels (2j-1 .. 2j+2) x time taps (t-1, t, t+1), zero-padded (SAME),
    plus 4 zero lanes.  Built XLA-side (pads + strided slices)."""
    b, t, m = x_mel.shape
    mp = m // 2
    x = jnp.pad(x_mel, ((0, 0), (1, 1 + t_grid - t), (1, 2)))
    cols = []
    for dt in range(3):
        xt = x[:, dt:dt + t_grid]                    # [B, t_grid, M+3]
        for dm4 in range(4):
            cols.append(xt[:, :, dm4:dm4 + 2 * mp:2])  # mel 2j-1+dm4
    stacked = jnp.stack(cols, axis=-1)               # [B, t_grid, mp, 12]
    stacked = jnp.pad(stacked, ((0, 0), (0, 0), (0, 0), (0, 4)))
    return stacked.reshape(b, t_grid * mp, 16)


def _block1_kernel(xa_ref, xb_ref, xc_ref, w1_ref, w2_ref, ab_ref,
                   out_ref, y1_ref, z2_ref, *, t: int, mp: int,
                   cout: int, tc: int, n_chunks: int, quantize: bool):
    """Grid = (batch, chunks of tc).  conv1 = K=16 bf16 dot on the
    prestaged im2col (3 adjacent chunk blocks provide the time halo);
    conv2 = banded int8 K=384 dot, N = (p, cout) = 128."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    rows1 = (tc + 2) * mp
    rows2 = tc * mp
    t0 = j * tc

    cat = jnp.concatenate([xa_ref[0], xb_ref[0], xc_ref[0]], axis=0)
    # conv1 out rows: times [t0-1, t0+tc+1) = cat rows [rows2-mp, ...)
    acc1 = jax.lax.dot_general(
        cat[rows2 - mp:rows2 - mp + rows1], w1_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    trow1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // mp
    tval1 = ((trow1 + (t0 - 1)) >= 0) & ((trow1 + (t0 - 1)) < t)
    y1 = jnp.where(tval1, jnp.maximum(
        acc1 * ab_ref[0:1] + ab_ref[1:2], 0.0), 0.0)

    y1_ref[0:1] = jnp.zeros((1, 2 * cout), y1_ref.dtype)
    y1_ref[rows1 + 1:rows1 + 2] = jnp.zeros((1, 2 * cout), y1_ref.dtype)
    if quantize:
        sy = jnp.maximum(jnp.max(y1), 1e-6) / 127.0
        y1_ref[pl.ds(1, rows1)] = _quant_i8(y1, 1.0 / sy)
    else:
        sy = 1.0
        y1_ref[pl.ds(1, rows1)] = y1.astype(y1_ref.dtype)

    acc_dtype = jnp.int32 if quantize else jnp.float32
    _stage3(z2_ref, y1_ref, rows1, mp, 2 * cout)
    acc2 = jnp.zeros((rows2, 2 * cout), acc_dtype)
    for dt in range(3):
        acc2 = acc2 + jax.lax.dot_general(
            z2_ref[dt * mp:dt * mp + rows2],
            w2_ref[dt * 6 * cout:(dt + 1) * 6 * cout],
            (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
    y2 = jnp.maximum(
        acc2.astype(jnp.float32) * (ab_ref[2:3] * sy) + ab_ref[3:4], 0.0)

    # mel pool over parity lane halves (cout=64: one sub-128 slice pair
    # on the final value), time pool over row pairs
    s = (y2[:, :cout] + y2[:, cout:]) * 0.25
    mx = jnp.maximum(y2[:, :cout], y2[:, cout:])
    s, mx = _time_pool(s, mx, rows2, mp, cout)
    out_ref[0] = (s + mx).astype(out_ref.dtype)


def fused_block1(x_mel: jax.Array, w1, ab1, w2, ab2, *,
                 quantize: bool = True, tc: int | None = None,
                 compute_dtype=jnp.bfloat16,
                 interpret: bool = False) -> jax.Array:
    """Fused PANNs block1 (Cin=1 -> 64 -> 64, pool (2,2)) from log-mel.

    x_mel: ``[B, T, M]`` post-bn0 log-mel (M = 64); returns
    ``[B, T//2, M//2, 64]`` (floor pool drops an odd trailing frame,
    matching torch).  conv1's im2col is built XLA-side
    (:func:`conv1_im2col`); the 1 GB conv1 activation never exists."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m = x_mel.shape
    cout = w2.shape[-1]
    mp = m // 2
    t_out = t // 2
    if tc is None:
        tc = 48 if (-(-t // 48)) * 48 * mp <= (t + 96) * mp else 2
    t_grid = -(-t // tc) * tc
    n_chunks = t_grid // tc

    xim = conv1_im2col(x_mel.astype(compute_dtype), t_grid)

    w1f = _conv1_w16(w1)
    w2f = _banded_weight(_np_w(w2))
    a1, bb1 = (jnp.asarray(v, jnp.float32) for v in ab1)
    a2, bb2 = (jnp.asarray(v, jnp.float32) for v in ab2)
    if quantize:
        s2 = _w_scales(_np_w(w2))
        w2f = _quant_rows(w2f, np.tile(s2, 2))
        a2 = a2 * s2
        w2dtype = jnp.int8
    else:
        w2dtype = compute_dtype
    ab = jnp.stack([jnp.concatenate([v] * 2) for v in
                    (a1, bb1, a2, bb2)]).astype(jnp.float32)

    rows1 = (tc + 2) * mp
    rows2 = tc * mp
    q_dtype = jnp.int8 if quantize else compute_dtype

    kern = functools.partial(_block1_kernel, t=t, mp=mp, cout=cout,
                             tc=tc, n_chunks=n_chunks, quantize=quantize)
    cmax = n_chunks - 1
    out = pl.pallas_call(
        kern,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, rows2, 16),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows2, 16), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows2, 16),
                         lambda i, j: (i, jnp.minimum(j + 1, cmax), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2f.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2 * cout), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, (tc // 2) * mp, cout), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (t_grid // 2) * mp, cout),
            jnp.bfloat16 if quantize else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows1 + 2, 2 * cout), q_dtype),        # y1
            pltpu.VMEM((rows1, 6 * cout), q_dtype),            # z2
        ],
        interpret=interpret,
    )(xim, xim, xim, jnp.asarray(w1f, compute_dtype),
      jnp.asarray(w2f, w2dtype), ab)
    return out.reshape(b, t_grid // 2, mp, cout)[:, :t_out]
