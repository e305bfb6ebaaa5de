"""Winograd F(2x2, 3x3) fused PANNs ConvBlock kernel (blocks 3-4).

Exact-math MAC reduction for the compute-bound Cin >= 128 blocks
(reference FLOPs contract ``/root/reference/models/panns.py:5-62``): a
3x3 conv over 2x2 output tiles needs 16 pointwise ``[tiles, Cin] @
[Cin, Cout]`` products instead of 36 — a 2.25x cut at identical dot
shapes.  F(2,3)'s transform matrices are exact in binary floating point
(B^T/A^T entries in {0, +-1}, G entries in {0, 0.5, 1}), so the
reformulation is mathematically the same conv, not an approximation.

TPU-first structure (everything rides the round-3 Mosaic findings):

* **plane form**: conv outputs live as 4 parity planes ``Y[tau][mu]``
  ``[tile_rows, C]`` (full-res ``y[2a+tau, 2b+mu] = Y[tau][mu][a, b]``).
  Then (a) conv2's 16 Winograd input slices ``d2[i][j]`` are STATIC
  tile-offset slices of conv1's plane refs — no interleave, no im2col,
  no window staging; and (b) the block's trailing 2x2 avg+max pool is
  an ELEMENTWISE max/avg across the four conv2 planes — the pool
  disappears into 6 vector ops;
* conv1's 16 input slices come off the staged chunk with one static
  offset each + the reshape/middle-slice stride-2 trick (the only
  strided access Mosaic lowers); mel-edge taps are masked on the tile
  column index, time edges ride the whole-clip zero-padded copy;
* dots consume register values directly: V_k is built by {+,-}
  butterflies of the slices, int8 mode quantizes V_k per-k per-chunk
  from registers (per-k dynamic scales absorb the transform's <=4x
  range growth) against per-(k, cout) weight scales;
* weights are pre-transformed on the host: ``U_k = G w G^T``.

The XLA ConvBlock and the direct9 kernel (conv_block.py) remain the
references; interpret-mode CI pins both the f32 math (vs lax.conv) and
the int8 fake-quant path.

VERDICT (round 3, on-chip, scripts/bench_wino.py): **CLOSED — measured
dead end, UNROUTED in production.**  At the pool-(2,2) analog shapes
wino int8 measures 15.0 ms vs direct9's 5.2 (block3) and 9.6 vs 4.3
(block4): the butterfly/plane transforms are serialized VPU work that
Mosaic does NOT overlap with in-flight MXU dots (pinned twice; see
CLAUDE.md Mosaic pitfalls), so the 2.25x MAC cut is swamped.  The
flagship's blocks 3-4 also pool (1,2), which this kernel does not
support — ``TTG_WINO=1`` never routes there.  Kept in-tree as a
parity-tested record of the measured closure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    _quant_i8,
    fold_bn,
)

__all__ = ["fused_block_wino", "winograd_conv3x3", "fold_bn"]

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308).
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_weights(w: jax.Array) -> jax.Array:
    """``[3, 3, Cin, Cout]`` HWIO -> ``[16, Cin, Cout]`` (k = 4*i + j)."""
    u = jnp.einsum("ax,by,xyio->abio", jnp.asarray(_G), jnp.asarray(_G),
                   jnp.asarray(w, jnp.float32))
    return u.reshape(16, w.shape[2], w.shape[3])


def winograd_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """Reference Winograd conv (pure jnp, SAME zero padding, NHWC
    ``[B, T, M, C]``; T and M even).  Used to pin the math in CI."""
    b, t, m, cin = x.shape
    cout = w.shape[3]
    u = transform_weights(w).reshape(4, 4, cin, cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[i][j][(a, b)] = xp[2a+i, 2b+j]
    d = jnp.stack([jnp.stack([
        xp[:, i:i + t:2, j:j + m:2] for j in range(4)], 0)
        for i in range(4)], 0)                       # [4, 4, B, t/2, m/2, C]
    v = jnp.einsum("ix,jy,xybtmc->ijbtmc", jnp.asarray(_BT),
                   jnp.asarray(_BT), d)
    mm = jnp.einsum("ijbtmc,ijco->ijbtmo", v, u)
    y = jnp.einsum("pi,qj,ijbtmo->btpmqo", jnp.asarray(_AT),
                   jnp.asarray(_AT), mm)             # [B,t/2,2,m/2,2,O]
    return y.reshape(b, t, m, cout)


def _butterfly(d):
    """V = B^T d B over a 4x4 list-of-lists of arrays ({+,-} only)."""
    s = [[None] * 4 for _ in range(4)]
    for j in range(4):
        s[0][j] = d[0][j] - d[2][j]
        s[1][j] = d[1][j] + d[2][j]
        s[2][j] = d[2][j] - d[1][j]
        s[3][j] = d[1][j] - d[3][j]
    v = [[None] * 4 for _ in range(4)]
    for i in range(4):
        v[i][0] = s[i][0] - s[i][2]
        v[i][1] = s[i][1] + s[i][2]
        v[i][2] = s[i][2] - s[i][1]
        v[i][3] = s[i][1] - s[i][3]
    return v


def _kernel(x_ref, u1_ref, u2_ref, ab_ref, out_ref, xp_ref, xc_ref,
            y00_ref, y01_ref, y10_ref, y11_ref, *, t: int, m: int,
            cin: int, cout: int, tc: int, tpad: int, quantize: bool):
    """Grid = (batch, time chunks of tc output rows).

    xp: whole-clip input rows (t, m) (m fastest), 4 zero time steps each
    side plus 1 lead row: row(tt, mm) = (tt + 4) * m + mm + 1.
    xc: this chunk's window (one dynamic-offset copy; static offsets
    below): xc row r = xp row t0*m + r, i.e. d1[i][j] at tile (u, b)
    (full-res input (t0 - 3 + 2u + i, 2b + j - 1)) is xc row
    2*(u*m + b) + (i+1)*m + j.
    y{tau}{mu}: conv1 parity planes [1 + rows1 + 1, cout] with one
    zero halo row each side, so conv2's 16 static plane slices
    (du in {0,1,2}, db in {-1,0,1}) stay in bounds.
    u1/u2: host-pretransformed weights [16*cin, cout] / [16*cout, cout].
    ab: [36, cout] f32 = a1, b1, a2, b2, then 16 su1_k + 16 su2_k
    per-(k, cout) weight-scale rows (ones when not quantized).
    """
    import jax.experimental.pallas as pl

    jj = pl.program_id(1)
    mp = m // 2
    tiles1_t = tc // 2 + 2            # conv1 tile rows incl. +-1 halo
    rows1 = tiles1_t * mp
    rows2 = (tc // 2) * mp
    rows_xc = (tc + 8) * m + 8

    @pl.when(jj == 0)
    def _():
        lead = 4 * m + 1
        xp_ref[0:lead] = jnp.zeros((lead, cin), xp_ref.dtype)
        xp_ref[pl.ds(lead, tpad * m)] = x_ref[0].astype(xp_ref.dtype)
        xp_ref[pl.ds(lead + tpad * m, lead)] = jnp.zeros(
            (lead, cin), xp_ref.dtype)
        zr = jnp.zeros((1, cout), y00_ref.dtype)
        for ref in (y00_ref, y01_ref, y10_ref, y11_ref):
            ref[0:1] = zr
            ref[rows1 + 1:rows1 + 2] = zr

    t0 = jj * tc
    xc_ref[...] = xp_ref[pl.ds(t0 * m, rows_xc)]

    # ---- conv1: 16 subsampled slices -> butterfly -> 16 dots ----
    rows_w = 2 * tiles1_t * m
    col1 = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) % mp

    def d1_slice(i, j):
        ofs = (i + 1) * m + j
        w = xc_ref[ofs:ofs + rows_w]
        w = w.reshape(rows_w // 2, 2, cin)[:, 0]       # flat stride 2
        w = w.reshape(tiles1_t, m, cin)[:, :mp]        # drop mel aliases
        w = w.reshape(rows1, cin).astype(jnp.float32)
        # mel edges: j=0 reads mel -1 at b=0, j=3 reads mel m at
        # b=mp-1 (both alias neighboring time rows) -> zero them
        if j == 0:
            w = jnp.where(col1 == 0, 0, w)
        elif j == 3:
            w = jnp.where(col1 == mp - 1, 0, w)
        return w

    v1 = _butterfly([[d1_slice(i, j) for j in range(4)]
                     for i in range(4)])

    a1 = ab_ref[0:1]
    b1 = ab_ref[1:2]
    a2 = ab_ref[2:3]
    b2 = ab_ref[3:4]

    def conv_planes(v, u_ref, k_dim, n_rows, su_row0):
        """16 dots + two-stage A^T M A output butterfly (24 adds, not
        the naive 36 plane accumulations)."""
        mm = [[None] * 4 for _ in range(4)]
        for i in range(4):
            for j in range(4):
                k = 4 * i + j
                vk = v[i][j]
                if quantize:
                    sv = jnp.maximum(jnp.max(jnp.abs(vk)), 1e-6) / 127.0
                    mk = jax.lax.dot_general(
                        _quant_i8(vk, 1.0 / sv),
                        u_ref[k * k_dim:(k + 1) * k_dim],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    mk = mk.astype(jnp.float32) * (
                        sv * ab_ref[su_row0 + k:su_row0 + k + 1])
                else:
                    mk = jax.lax.dot_general(
                        vk.astype(u_ref.dtype),
                        u_ref[k * k_dim:(k + 1) * k_dim],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                mm[i][j] = mk
        # stage 1 (over i): S[p][j] = A^T[p] . M[:, j]
        s0 = [mm[0][j] + mm[1][j] + mm[2][j] for j in range(4)]
        s1 = [mm[1][j] - mm[2][j] - mm[3][j] for j in range(4)]
        # stage 2 (over j): Y[p][q] = A^T[q] . S[p]
        return [[sp[0] + sp[1] + sp[2], sp[1] - sp[2] - sp[3]]
                for sp in (s0, s1)]

    y1 = conv_planes(v1, u1_ref, cin, rows1, 4)

    # BN + ReLU + validity: plane (tau, mu) tile row u is full-res
    # t = t0 - 2 + 2u + tau; zero outside [0, t) so conv2 sees the
    # reference's zero padding (incl. the odd-T pad row)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (rows1, 1), 0) // mp
    yrefs = [[y00_ref, y01_ref], [y10_ref, y11_ref]]
    for tau in range(2):
        tfull = 2 * u_idx + (t0 - 2 + tau)
        valid = (tfull >= 0) & (tfull < t)
        for mu in range(2):
            yrefs[tau][mu][pl.ds(1, rows1)] = jnp.where(
                valid, jnp.maximum(y1[tau][mu] * a1 + b1, 0.0),
                0.0).astype(y00_ref.dtype)

    # ---- conv2: d2 slices are static plane-ref slices ----
    # conv2 tile (u', b'): input (t0 + 2u' + i - 1, 2b' + j - 1) lives
    # in plane (tau, mu) at tile (u' + du, b' + db):
    #   i: 0 -> (tau=1, du=0)  1 -> (0, 1)  2 -> (1, 1)  3 -> (0, 2)
    #   j: 0 -> (mu=1, db=-1)  1 -> (0, 0)  2 -> (1, 0)  3 -> (0, 1)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (rows2, 1), 0) % mp
    ti = [(1, 0), (0, 1), (1, 1), (0, 2)]
    tj = [(1, -1), (0, 0), (1, 0), (0, 1)]

    def d2_slice(i, j):
        tau, du = ti[i]
        mu, db = tj[j]
        start = 1 + du * mp + db          # +1: plane lead halo row
        sl = yrefs[tau][mu][start:start + rows2].astype(jnp.float32)
        if db == -1:
            sl = jnp.where(col2 == 0, 0, sl)
        elif db == 1:
            sl = jnp.where(col2 == mp - 1, 0, sl)
        return sl

    v2 = _butterfly([[d2_slice(i, j) for j in range(4)]
                     for i in range(4)])
    z = conv_planes(v2, u2_ref, cout, rows2, 20)

    # BN + ReLU, then the 2x2 avg+max pool = elementwise across planes
    for tau in range(2):
        for mu in range(2):
            z[tau][mu] = jnp.maximum(z[tau][mu] * a2 + b2, 0.0)
    s = z[0][0] + z[0][1] + z[1][0] + z[1][1]
    mx = jnp.maximum(jnp.maximum(z[0][0], z[0][1]),
                     jnp.maximum(z[1][0], z[1][1]))
    out_ref[0] = (s * 0.25 + mx).astype(out_ref.dtype)


def fused_block_wino(x: jax.Array, w1: jax.Array, ab1: tuple,
                     w2: jax.Array, ab2: tuple, *,
                     quantize: bool = False, tc: int | None = None,
                     compute_dtype: jnp.dtype = jnp.bfloat16,
                     interpret: bool | None = None) -> jax.Array:
    """Whole PANNs block via Winograd F(2x2, 3x3) in plane form.

    x ``[B, T, M, Cin]`` (M even); returns ``[B, T//2, M//2, Cout]``
    bf16 — reference ConvBlock semantics (conv3x3 -> BN -> ReLU, twice,
    then 2x2 avg+max pool with floor division).  Serving only (running
    BN stats folded via :func:`fold_bn`).
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
            lambda x_, w1_, a1, b1, w2_, a2, b2: fused_block_wino(
                x_, w1_, (a1, b1), w2_, (a2, b2), quantize=quantize,
                tc=tc, compute_dtype=compute_dtype, interpret=interpret),
            (x, w1, *ab1, w2, *ab2),
            (0, None, None, None, None, None, None))

    b, t, m, cin = x.shape
    cout = w1.shape[-1]
    assert m % 2 == 0
    tpad, tc = (_pick_tpad_tc(t, m, cin, cout, quantize, compute_dtype)
                if tc is None else (t + (t % 2), tc))
    if tpad != t:
        x = jnp.pad(x, ((0, 0), (0, tpad - t), (0, 0), (0, 0)))

    u1 = transform_weights(jnp.asarray(w1, jnp.float32))  # [16, cin, cout]
    u2 = transform_weights(jnp.asarray(w2, jnp.float32))
    a1, b1 = (jnp.asarray(v, jnp.float32) for v in ab1)
    a2, b2 = (jnp.asarray(v, jnp.float32) for v in ab2)
    if quantize:
        su1 = jnp.maximum(jnp.max(jnp.abs(u1), axis=1), 1e-8) / 127.0
        su2 = jnp.maximum(jnp.max(jnp.abs(u2), axis=1), 1e-8) / 127.0
        u1p = _quant_i8(u1, 1.0 / su1[:, None]).reshape(16 * cin, cout)
        u2p = _quant_i8(u2, 1.0 / su2[:, None]).reshape(16 * cout, cout)
        scale_rows = jnp.concatenate([su1, su2], 0)       # [32, cout]
    else:
        u1p = u1.astype(compute_dtype).reshape(16 * cin, cout)
        u2p = u2.astype(compute_dtype).reshape(16 * cout, cout)
        scale_rows = jnp.ones((32, cout), jnp.float32)
    ab = jnp.concatenate([jnp.stack([a1, b1, a2, b2], 0), scale_rows], 0)

    xf = x.reshape(b, tpad * m, cin).astype(compute_dtype)
    mp = m // 2
    tiles1_t = tc // 2 + 2
    rows1 = tiles1_t * mp
    kern = functools.partial(_kernel, t=t, m=m, cin=cin, cout=cout,
                             tc=tc, tpad=tpad, quantize=quantize)
    plane = pltpu.VMEM((rows1 + 2, cout), compute_dtype)
    out = pl.pallas_call(
        kern,
        grid=(b, tpad // tc),
        in_specs=[
            pl.BlockSpec((1, tpad * m, cin), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((16 * cin, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((16 * cout, cout), lambda i, j: (0, 0)),
            pl.BlockSpec((36, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tc // 2 * mp, cout),
                               lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, tpad // 2 * mp, cout),
            jnp.bfloat16 if quantize else compute_dtype),
        scratch_shapes=[
            pltpu.VMEM(((tpad + 8) * m + 8, cin), compute_dtype),
            pltpu.VMEM(((tc + 8) * m + 8, cin), compute_dtype),
            plane, plane, plane, plane,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(xf, u1p, u2p, ab)
    out = out.reshape(b, tpad // 2, mp, cout)
    if tpad // 2 != t // 2:
        out = out[:, :t // 2]
    return out


def _wino_vmem_bytes(tc: int, tpad: int, m: int, cin: int, cout: int,
                     quantize: bool, compute_dtype) -> int:
    """Rough per-chunk VMEM estimate: resident weight refs + the
    butterfly's peak of ~32 live [rows, C] f32 arrays per conv + plane
    refs + the staged input."""
    mp = m // 2
    rows1 = (tc // 2 + 2) * mp
    rows2 = (tc // 2) * mp
    isize = jnp.dtype(compute_dtype).itemsize
    wsize = 1 if quantize else isize
    return (
        16 * (cin + cout) * cout * wsize          # u1 + u2 refs
        + 32 * rows1 * cin * 4                    # conv1 butterfly peak
        + 32 * rows2 * cout * 4                   # conv2 butterfly peak
        + 4 * (rows1 + 2) * cout * isize          # y1 plane refs
        + ((tpad + 8) * m + 8) * cin * isize      # xp
        + ((tc + 8) * m + 8) * cin * isize        # xc
        + 2 * rows2 * cout * 2                    # out block (x2 pipeline)
    )


def _pick_tpad_tc(t: int, m: int, cin: int = 128, cout: int = 128,
                  quantize: bool = True,
                  compute_dtype=jnp.bfloat16,
                  vmem_budget: int = 13 * 2 ** 20) -> tuple:
    """Smallest zero-padded T (even, growing to multiples of 8/16/32)
    admitting an even chunk tc whose estimated working set fits VMEM
    and whose pooled out block is (8, 128)-tileable."""
    mp = m // 2

    def pick(tpad):
        best = 0
        for c in range(2, tpad + 1, 2):
            if tpad % c != 0:
                continue
            if (c // 2 * mp) % 8 != 0 and c != tpad:
                continue
            if _wino_vmem_bytes(c, tpad, m, cin, cout, quantize,
                                compute_dtype) > vmem_budget:
                continue
            best = c
        return best

    for mult in (2, 8, 16, 32, 64):
        tpad = -(-t // mult) * mult
        c = pick(tpad)
        if c:
            return tpad, c
    raise ValueError(f"no valid wino chunking for T={t} m={m} "
                     f"cin={cin} cout={cout}")
