"""Pallas scan-fused BiGRU recurrence (serving forward path).

SURVEY §7 names the GRU recurrence as the anti-XLA part of the model
(250 sequential steps) and a Pallas scan fusion as the target design.
This kernel keeps the recurrent weights and both direction carries
resident in VMEM across a ``grid=(T,)`` sequential walk, so each step is
two ``[B, H] @ [H, 3H]`` MXU dots + VPU gates with no per-step weight
refetch or dynamic-update-slice traffic (the ``lax.scan`` cost XLA
pays).  The input projections stay in XLA — one big
``[B, T, D] @ [D, 3H]`` matmul per direction is already MXU-optimal
(models/layers.py GRUSeq hoisting).

Layout: time-major ``proj [T, 2B, 3H]`` (direction-0 rows then
direction-1 rows; direction 1 reads time-flipped projections, exactly
like the grouped ``lax.scan`` in models/layers.py BiGRU) -> output
``ys [T, 2B, H]``.  Forward/serving only — training keeps the XLA scan
(this kernel defines no VJP).

Reference recurrence: torch ``nn.GRU`` r/z/n gates,
``h' = (1-z) n + z h`` (reference models/audio_encoder.py:141).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bigru_pallas"]


def _kernel(proj_ref, wh_ref, bn_ref, out_ref, h0_ref, h1_ref, *,
            b: int, h: int, dtype):
    import jax.experimental.pallas as pl

    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        h0_ref[...] = jnp.zeros((b, h), dtype)
        h1_ref[...] = jnp.zeros((b, h), dtype)

    def step(hid_ref, g, rows):
        pp = proj_ref[0, rows:rows + b].astype(jnp.float32)
        rzn = jax.lax.dot_general(
            hid_ref[...], wh_ref[g * h:(g + 1) * h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
        z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
        n = jnp.tanh(pp[:, 2 * h:] + r * (rzn[:, 2 * h:]
                                          + bn_ref[g:g + 1]))
        hid = (1 - z) * n + z * hid_ref[...].astype(jnp.float32)
        hid_ref[...] = hid.astype(dtype)
        out_ref[0, rows:rows + b] = hid.astype(out_ref.dtype)

    step(h0_ref, 0, 0)
    step(h1_ref, 1, b)


def bigru_pallas(proj: jax.Array, wh: jax.Array, bn: jax.Array, *,
                 dtype=jnp.float32,
                 interpret: bool | None = None) -> jax.Array:
    """proj ``[T, 2B, 3H]`` (hoisted input projections + bias, f32;
    direction 1 rows time-flipped), wh ``[2, H, 3H]``, bn ``[2, H]`` ->
    ys ``[T, 2B, H]`` f32 (direction 1 still time-flipped; caller
    unflips and concatenates, models/layers.py BiGRU)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return _shard_bigru(
            functools.partial(bigru_pallas, dtype=dtype,
                              interpret=interpret),
            proj, wh, bn, maybe_shard)

    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3
    kern = functools.partial(_kernel, b=b, h=h, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda j: (j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((2, h), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, b2, h), lambda j: (j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, b2, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, h), dtype),
                        pltpu.VMEM((b, h), dtype)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(proj, wh.reshape(2 * h, h3).astype(dtype), bn)


# ---------------------------------------------------------------------
# custom VJP: the f32 BiGRU backward is the single remaining gap to the
# >=900 clips/s training bar (STATUS.md) — XLA's scan backward streams
# dynamic-update-slice state; this kernel walks the grid REVERSED
# (index maps j -> T-1-j), recomputes the gates from the saved outputs
# (3 dots/step/direction) and accumulates the weight grads in scratch.
# ---------------------------------------------------------------------


def _bwd_kernel(proj_ref, ysp_ref, g_ref, wh_ref, wht_ref, bn_ref,
                dproj_ref, dwh_ref, dbn_ref, dh0_ref, dh1_ref,
                awh_ref, abn_ref, *, b: int, h: int, t: int,
                dot_dtype=jnp.float32):
    """``dot_dtype=bfloat16`` runs every MXU dot (gate recompute, the
    dh chain, the dWh accumulation) on bf16 operands with f32
    accumulation — the carry/accumulator state (dh, awh, abn) and the
    gate math stay f32.  Casting ``ysp`` rows to bf16 reproduces the
    bf16 forward's recurrent dot operand EXACTLY (the forward stores
    its carry as ``hid.astype(bfloat16)`` of the same f32 value it
    outputs), so the recomputed gates match the forward's bit-for-bit.
    Reference bar: cuDNN RNN under autocast
    (/root/reference/models/audio_encoder.py:141,217)."""
    import jax.experimental.pallas as pl

    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        dh0_ref[...] = jnp.zeros((b, h), jnp.float32)
        dh1_ref[...] = jnp.zeros((b, h), jnp.float32)
        awh_ref[...] = jnp.zeros((2 * h, 3 * h), jnp.float32)
        abn_ref[...] = jnp.zeros((2, h), jnp.float32)

    def step(dh_ref, g, rows):
        pp = proj_ref[0, rows:rows + b]
        h_prev = ysp_ref[0, rows:rows + b]
        h_op = h_prev.astype(dot_dtype)
        gt = g_ref[0, rows:rows + b]
        rzn = jax.lax.dot_general(
            h_op, wh_ref[g * h:(g + 1) * h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bn = bn_ref[g:g + 1]
        r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
        z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
        an = rzn[:, 2 * h:] + bn
        n = jnp.tanh(pp[:, 2 * h:] + r * an)

        dhp = gt + dh_ref[...]                       # dL/dh_t
        dn = dhp * (1 - z)
        dz = dhp * (h_prev - n)
        da_n = dn * (1 - n * n)
        dr = da_n * an
        da_r = dr * r * (1 - r)
        da_z = dz * z * (1 - z)
        drzn_n = da_n * r
        # dproj = (da_r, da_z, da_n) — stored per third, and the
        # d_rzn-dependent dots run per third too (lane-axis concat
        # does not lower on Mosaic; Wh^T comes pre-split per gate)
        dproj_ref[0, rows:rows + b, 0:h] = da_r
        dproj_ref[0, rows:rows + b, h:2 * h] = da_z
        dproj_ref[0, rows:rows + b, 2 * h:3 * h] = da_n
        dh_new = dhp * z
        for third, dcol in ((0, da_r), (1, da_z), (2, drzn_n)):
            dcol_op = dcol.astype(dot_dtype)
            dh_new = dh_new + jax.lax.dot_general(
                dcol_op,
                wht_ref[(g * 3 + third) * h:(g * 3 + third + 1) * h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            awh_ref[g * h:(g + 1) * h,
                    third * h:(third + 1) * h] = (
                awh_ref[g * h:(g + 1) * h, third * h:(third + 1) * h]
                + jax.lax.dot_general(
                    h_op, dcol_op, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        abn_ref[g:g + 1] = abn_ref[g:g + 1] + jnp.sum(
            drzn_n, axis=0, keepdims=True)
        dh_ref[...] = dh_new

    step(dh0_ref, 0, 0)
    step(dh1_ref, 1, b)

    @pl.when(jj == t - 1)
    def _():
        dwh_ref[...] = awh_ref[...]
        dbn_ref[...] = abn_ref[...]


def _bigru_fwd(proj, wh, bn, interpret, dtype=jnp.float32):
    ys = bigru_pallas(proj, wh, bn, dtype=dtype,
                      interpret=interpret)
    return ys, (proj, ys, wh, bn)


def _bigru_bwd(interpret, res, g, dot_dtype=jnp.float32):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    proj, ys, wh, bn = res
    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3
    # h_{t-1} per step: the fwd outputs shifted right by one (h_{-1}=0)
    ysp = jnp.concatenate([jnp.zeros((1, b2, h), jnp.float32),
                           ys[:-1]], axis=0)
    whf = wh.reshape(2 * h, h3).astype(jnp.float32)
    # Wh^T pre-split per gate third: rows (g, third) -> [H, H] blocks
    wht = jnp.concatenate(
        [whf[g * h:(g + 1) * h, th * h:(th + 1) * h].T
         for g in range(2) for th in range(3)], axis=0)   # [6H, H]
    whk = whf.astype(dot_dtype)
    whtk = wht.astype(dot_dtype)
    rev = t - 1

    kern = functools.partial(_bwd_kernel, b=b, h=h, t=t,
                             dot_dtype=dot_dtype)
    dproj, dwh, dbn = pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((6 * h, h), lambda j: (0, 0)),
            pl.BlockSpec((2, h), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((2, h), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b2, h3), jnp.float32),
            jax.ShapeDtypeStruct((2 * h, h3), jnp.float32),
            jax.ShapeDtypeStruct((2, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32),
                        pltpu.VMEM((b, h), jnp.float32),
                        pltpu.VMEM((2 * h, 3 * h), jnp.float32),
                        pltpu.VMEM((2, h), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(proj.astype(jnp.float32), ysp, g.astype(jnp.float32), whk, whtk,
      jnp.asarray(bn, jnp.float32))
    return dproj, dwh.reshape(wh.shape), dbn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bigru_diff(proj, wh, bn, interpret):
    return bigru_pallas(proj, wh, bn, dtype=jnp.float32,
                        interpret=interpret)


def _bigru_diff_fwd(proj, wh, bn, interpret):
    return _bigru_fwd(proj, wh, bn, interpret)


_bigru_diff.defvjp(_bigru_diff_fwd, _bigru_bwd)


# bf16-recurrence trainable variant (VERDICT r4 item 3): the forward
# carries bf16 (exactly the serving recurrence, which has measured
# metric parity), the backward runs every dot on bf16 operands with f32
# carry/accumulators.  Convergence A/B: scripts/ab_gru_convergence.py
# --bf16; step-time: scripts/probe_gru_bf16.py.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bigru_diff_b16(proj, wh, bn, interpret):
    return bigru_pallas(proj, wh, bn, dtype=jnp.bfloat16,
                        interpret=interpret)


_bigru_diff_b16.defvjp(
    lambda proj, wh, bn, interpret: _bigru_fwd(proj, wh, bn, interpret,
                                               dtype=jnp.bfloat16),
    functools.partial(_bigru_bwd, dot_dtype=jnp.bfloat16))


def bigru_pallas_trainable_bf16(proj: jax.Array, wh: jax.Array,
                                bn: jax.Array, *,
                                interpret: bool | None = None) -> jax.Array:
    """:func:`bigru_pallas_trainable` with a bf16 recurrence: bf16 MXU
    dots everywhere (forward carry, gate recompute, dh chain, dWh), f32
    gate math and f32 dh/dWh accumulators."""
    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return _shard_bigru(
            functools.partial(bigru_pallas_trainable_bf16,
                              interpret=interpret),
            proj, wh, bn, maybe_shard)
    return _bigru_diff_b16(proj, wh, bn, interpret)


def _bwd_kernel_v2(proj_ref, ysp_ref, g_ref, wh_ref, wht_ref, bnb_ref,
                   dproj_ref, drznn_ref, dh_ref, dcols_ref, *,
                   b: int, h: int):
    """Reversed-grid backward, round-4 redesign: the kernel only runs
    the sequential part (gate recompute + the dh chain); dWh/dbn move
    to one XLA einsum over T after the walk (probe_gru_bwd_r4.py — the
    in-kernel per-step dW accumulation was 3 extra dots + ~0.8 M VPU
    adds per step).  Both directions' gate math is batched on [2B, .]
    blocks; the dh contribution is ONE K=3H dot per direction from a
    dcols scratch (lane-axis concat does not lower; column stores do)."""
    import jax.experimental.pallas as pl

    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        dh_ref[...] = jnp.zeros((2 * b, h), jnp.float32)

    pp = proj_ref[0]
    h_prev = ysp_ref[0]
    gt = g_ref[0]
    rzn = jnp.concatenate([
        jax.lax.dot_general(h_prev[:b], wh_ref[:h],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(h_prev[b:], wh_ref[h:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)], axis=0)
    r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
    z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
    an = rzn[:, 2 * h:] + bnb_ref[...]
    n = jnp.tanh(pp[:, 2 * h:] + r * an)

    dhp = gt + dh_ref[...]
    dn = dhp * (1 - z)
    dz = dhp * (h_prev - n)
    da_n = dn * (1 - n * n)
    dr = da_n * an
    da_r = dr * r * (1 - r)
    da_z = dz * z * (1 - z)
    drzn_n = da_n * r
    dcols_ref[:, :h] = da_r
    dcols_ref[:, h:2 * h] = da_z
    dcols_ref[:, 2 * h:] = drzn_n
    dproj_ref[0, :, :h] = da_r
    dproj_ref[0, :, h:2 * h] = da_z
    dproj_ref[0, :, 2 * h:] = da_n
    drznn_ref[0] = drzn_n
    dh_ref[...] = dhp * z + jnp.concatenate([
        jax.lax.dot_general(dcols_ref[:b], wht_ref[:3 * h],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        jax.lax.dot_general(dcols_ref[b:], wht_ref[3 * h:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)], axis=0)


def _bwd_kernel_v3(proj_ref, ysp_ref, g_ref, wh_ref, wht_ref, bn_ref,
                   dproj_ref, drznn_ref, dh0_ref, dh1_ref, *,
                   b: int, h: int):
    """v3: the round-3 backward minus the in-kernel dW/dbn accumulation
    (hoisted to the post-walk einsum) — per-direction register-resident
    dh dots, no dcols scratch roundtrip, no cross-direction concats."""
    import jax.experimental.pallas as pl

    jj = pl.program_id(0)

    @pl.when(jj == 0)
    def _():
        dh0_ref[...] = jnp.zeros((b, h), jnp.float32)
        dh1_ref[...] = jnp.zeros((b, h), jnp.float32)

    def step(dh_ref, g, rows):
        pp = proj_ref[0, rows:rows + b]
        h_prev = ysp_ref[0, rows:rows + b]
        gt = g_ref[0, rows:rows + b]
        rzn = jax.lax.dot_general(
            h_prev, wh_ref[g * h:(g + 1) * h],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        bn = bn_ref[g:g + 1]
        r = jax.nn.sigmoid(pp[:, :h] + rzn[:, :h])
        z = jax.nn.sigmoid(pp[:, h:2 * h] + rzn[:, h:2 * h])
        an = rzn[:, 2 * h:] + bn
        n = jnp.tanh(pp[:, 2 * h:] + r * an)

        dhp = gt + dh_ref[...]
        dn = dhp * (1 - z)
        dz = dhp * (h_prev - n)
        da_n = dn * (1 - n * n)
        dr = da_n * an
        da_r = dr * r * (1 - r)
        da_z = dz * z * (1 - z)
        drzn_n = da_n * r
        dproj_ref[0, rows:rows + b, 0:h] = da_r
        dproj_ref[0, rows:rows + b, h:2 * h] = da_z
        dproj_ref[0, rows:rows + b, 2 * h:3 * h] = da_n
        drznn_ref[0, rows:rows + b] = drzn_n
        dh_new = dhp * z
        for third, dcol in ((0, da_r), (1, da_z), (2, drzn_n)):
            dh_new = dh_new + jax.lax.dot_general(
                dcol, wht_ref[(g * 3 + third) * h:(g * 3 + third + 1) * h],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dh_ref[...] = dh_new

    step(dh0_ref, 0, 0)
    step(dh1_ref, 1, b)


def _bigru_bwd_v3(interpret, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    proj, ys, wh, bn = res
    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3
    ysp = jnp.concatenate([jnp.zeros((1, b2, h), jnp.float32),
                           ys[:-1]], axis=0)
    whf = wh.reshape(2 * h, h3).astype(jnp.float32)
    wht = jnp.concatenate(
        [whf[g * h:(g + 1) * h, th * h:(th + 1) * h].T
         for g in range(2) for th in range(3)], axis=0)   # [6H, H]
    rev = t - 1

    kern = functools.partial(_bwd_kernel_v3, b=b, h=h)
    dproj, drznn = pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((6 * h, h), lambda j: (0, 0)),
            pl.BlockSpec((2, h), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b2, h3), jnp.float32),
            jax.ShapeDtypeStruct((t, b2, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32),
                        pltpu.VMEM((b, h), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(proj.astype(jnp.float32), ysp, g.astype(jnp.float32), whf, wht,
      jnp.asarray(bn, jnp.float32))
    ysp4 = ysp.reshape(t, 2, b, h)
    dcols = jnp.concatenate([dproj[..., :2 * h], drznn], axis=-1)
    dwh = jnp.einsum("tgbh,tgbk->ghk", ysp4,
                     dcols.reshape(t, 2, b, h3),
                     preferred_element_type=jnp.float32)
    dbn = jnp.einsum("tgbh->gh", drznn.reshape(t, 2, b, h))
    return dproj, dwh.reshape(wh.shape), dbn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bigru_diff_v3(proj, wh, bn, interpret):
    return bigru_pallas(proj, wh, bn, dtype=jnp.float32,
                        interpret=interpret)


_bigru_diff_v3.defvjp(lambda proj, wh, bn, interpret:
                      _bigru_fwd(proj, wh, bn, interpret),
                      _bigru_bwd_v3)


def _bigru_bwd_v2(interpret, res, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    proj, ys, wh, bn = res
    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3
    ysp = jnp.concatenate([jnp.zeros((1, b2, h), jnp.float32),
                           ys[:-1]], axis=0)
    whf = wh.reshape(2 * h, h3).astype(jnp.float32)
    # full per-direction transposes [3H, H] stacked -> [6H, H]
    wht = jnp.concatenate([whf[:h].T, whf[h:].T], axis=0)
    bnb = jnp.concatenate(
        [jnp.broadcast_to(bn[0], (b, h)),
         jnp.broadcast_to(bn[1], (b, h))], axis=0).astype(jnp.float32)
    rev = t - 1

    kern = functools.partial(_bwd_kernel_v2, b=b, h=h)
    dproj, drznn = pl.pallas_call(
        kern,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((2 * h, h3), lambda j: (0, 0)),
            pl.BlockSpec((6 * h, h), lambda j: (0, 0)),
            pl.BlockSpec((b2, h), lambda j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, b2, h3), lambda j, rev=rev: (rev - j, 0, 0)),
            pl.BlockSpec((1, b2, h), lambda j, rev=rev: (rev - j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b2, h3), jnp.float32),
            jax.ShapeDtypeStruct((t, b2, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((b2, h), jnp.float32),
                        pltpu.VMEM((b2, h3), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(proj.astype(jnp.float32), ysp, g.astype(jnp.float32), whf, wht,
      bnb)
    # dWh[g] = sum_t h_prev_t^T @ [da_r | da_z | da_n*r]_t — one big
    # MXU einsum (contracting T*B) instead of 3 in-kernel dots/step
    ysp4 = ysp.reshape(t, 2, b, h)
    dcols = jnp.concatenate([dproj[..., :2 * h], drznn], axis=-1)
    dwh = jnp.einsum("tgbh,tgbk->ghk", ysp4,
                     dcols.reshape(t, 2, b, h3),
                     preferred_element_type=jnp.float32)
    dbn = jnp.einsum("tgbh->gh", drznn.reshape(t, 2, b, h))
    return dproj, dwh.reshape(wh.shape), dbn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bigru_diff_v2(proj, wh, bn, interpret):
    return bigru_pallas(proj, wh, bn, dtype=jnp.float32,
                        interpret=interpret)


_bigru_diff_v2.defvjp(lambda proj, wh, bn, interpret:
                      _bigru_fwd(proj, wh, bn, interpret),
                      _bigru_bwd_v2)


def bigru_pallas_trainable_v2(proj: jax.Array, wh: jax.Array,
                              bn: jax.Array, *,
                              interpret: bool | None = None) -> jax.Array:
    """:func:`bigru_pallas_trainable` with the round-4 backward redesign
    (same forward kernel; dWh/dbn hoisted out of the sequential walk).
    Mathematically identical gradients up to f32 summation order.

    VERDICT (round 4, on-chip, scripts/probe_gru_bwd_r4.py): **CLOSED —
    slower than the shipped v1** (6.00 vs 4.41 ms fwd+bwd at
    B=128/T=250/H=256): the per-step drznn output write + the post-walk
    dWh einsum cost more than the in-kernel dW dots they remove (those
    ride free under the DMA pipeline).  UNROUTED (``TTG_GRU_BWD=v2``
    opts in)."""
    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return _shard_bigru(
            functools.partial(bigru_pallas_trainable_v2,
                              interpret=interpret),
            proj, wh, bn, maybe_shard)
    return _bigru_diff_v2(proj, wh, bn, interpret)


def bigru_pallas_trainable_v3(proj: jax.Array, wh: jax.Array,
                              bn: jax.Array, *,
                              interpret: bool | None = None) -> jax.Array:
    """v3 backward: register-resident per-direction dh dots (as v1)
    with the dWh/dbn einsum hoist (as v2).

    VERDICT (round 4, on-chip, scripts/probe_gru_bwd_r4.py): **CLOSED —
    slower than the shipped v1** (5.04 vs 4.41 ms): same einsum-hoist
    traffic tax as v2.  UNROUTED (``TTG_GRU_BWD=v3`` opts in)."""
    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return _shard_bigru(
            functools.partial(bigru_pallas_trainable_v3,
                              interpret=interpret),
            proj, wh, bn, maybe_shard)
    return _bigru_diff_v3(proj, wh, bn, interpret)


def _shard_bigru(entry, proj, wh, bn, maybe_shard):
    """Batch-shard a BiGRU entry over the active kernel mesh.

    The ``[T, 2B, 3H]`` row layout interleaves the two directions at the
    B boundary, so the 2B dim cannot be sharded directly; reshape to
    ``[T, 2, B, 3H]``, shard dim 2, and re-flatten per shard (each
    device then holds both directions of its own batch slice)."""
    t, b2, h3 = proj.shape
    b, h = b2 // 2, h3 // 3

    def f4(p4, wh, bn):
        tl, g, bl, _ = p4.shape
        return entry(p4.reshape(tl, g * bl, h3), wh, bn).reshape(
            tl, g, bl, h)

    out = maybe_shard(f4, (proj.reshape(t, 2, b, h3), wh, bn),
                      (2, None, None), out_dim=2)
    return out.reshape(t, b2, h)


def bigru_pallas_trainable(proj: jax.Array, wh: jax.Array,
                           bn: jax.Array, *,
                           interpret: bool | None = None) -> jax.Array:
    """f32 BiGRU recurrence with a Pallas backward (custom VJP).

    Same contract as :func:`bigru_pallas`; gradients flow to ``proj``
    (and through it to the inputs and input-projection weights via the
    XLA einsum), ``wh`` and ``bn``.  Under an active kernel mesh the
    call is batch-shard_mapped; the shard_map transpose psums the
    replicated ``wh``/``bn`` cotangents over the axis
    (tests/test_kernel_shard.py pins this)."""
    from texttoaudiogrounding_tpu.ops.pallas.logmel import default_interpret
    from texttoaudiogrounding_tpu.parallel.kernel_shard import (
        active_kernel_mesh, maybe_shard)
    if interpret is None:
        interpret = default_interpret()
    if active_kernel_mesh() is not None:
        return _shard_bigru(
            functools.partial(bigru_pallas_trainable, interpret=interpret),
            proj, wh, bn, maybe_shard)
    return _bigru_diff(proj, wh, bn, interpret)
