"""Probe: manual double-buffered HBM->VMEM window DMA vs resident+copy.

The pair/direct9 kernels currently keep the whole (padded) clip resident
in VMEM and stage each chunk's halo'd window with a synchronous
dynamic-offset VMEM->VMEM copy (serialized with the dots).  Design under
test: input stays in HBM (``memory_space=ANY``); the kernel ping-pongs
two VMEM window buffers with ``pltpu.make_async_copy`` so chunk j+1's
fetch rides under chunk j's MXU dots.  Compute is duplicated under
``pl.when(j % 2 == 0/1)`` branches reading the A/B buffer (dots cannot
take dynamically-selected refs).

Geometry = the pair kernel's: windows of 1680 rows x 128 lanes
(aligned over-fetch, static +7 in-kernel offset), tc=100, B=128,
3 shifted K=128 dots per chunk stand in for the conv dots.

MEASURED (v5e, three runs, round 4) — manual DMA LOSES:

    manual HBM DMA ping-pong   : 4.21 / 4.27 / 4.23 ms
    resident + sync copy       : 3.46 / 3.11 / 2.92 ms
    resident + async VMEM-VMEM : fails to lower (Mosaic remote-compile
                                 500 on the dynamic-offset VMEM->VMEM
                                 make_async_copy source)

Verdict: Pallas's automatic grid pipeline already overlaps the HBM
fetch of block j+1 with block j's compute; a hand-rolled ping-pong
only adds per-step semaphore waits and duplicated compute branches
(dots cannot take dynamically-selected refs, so both A/B bodies are
emitted).  The serialized VMEM->VMEM staging copy cannot be made
async either — the DMA engine path fails to lower for dynamic-offset
VMEM sources.  Together with the Winograd/logmel-v4 findings (Mosaic
does not overlap VPU work with MXU dots), this closes the async-DMA
double-buffered-staging design from the round-3 verdict: the ~4 ms of
serialized staging per 64-channel block is structural on this
toolchain.  The remaining lever is removing staging entirely
(register-resident triple-stores — see conv_block1_pair.py).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, args, iters=30):
    carry = jnp.float32(0.0)
    out, carry = fn(*args, carry)
    float(carry)
    for _ in range(2):
        t0 = time.time()
        for _ in range(iters):
            out, carry = fn(*args, carry)
        float(carry)
        ms = (time.time() - t0) / iters * 1000.0
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    b, t, mp = 128, 500, 16
    tc = 100
    nc = t // tc
    rows2 = tc * mp                       # 1600
    lead = 2 * mp + 1                     # 33
    lead_al = 40
    d = lead_al - lead                    # +7
    rows_al = rows2 + 2 * lead_al         # 1680
    x2 = jax.random.normal(rng, (b, t * mp, 128), jnp.bfloat16)
    w = jax.random.normal(rng, (128, 128), jnp.bfloat16) * 0.05

    # ---------------- resident + sync copy (shipped form) -------------
    rows_x = rows2 + 2 * lead

    def dot_res_kernel(x_ref, w_ref, o_ref, xp_ref, xc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            xp_ref[0:lead] = jnp.zeros((lead, 128), xp_ref.dtype)
            xp_ref[pl.ds(lead, t * mp)] = x_ref[0]
            xp_ref[pl.ds(lead + t * mp, lead)] = jnp.zeros(
                (lead, 128), xp_ref.dtype)

        xc_ref[...] = xp_ref[pl.ds(j * rows2, rows_x)]
        acc = jnp.zeros((rows2, 128), jnp.float32)
        for s in range(3):
            acc = acc + jax.lax.dot_general(
                xc_ref[s * mp:s * mp + rows2], w_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

    def f_res(x, cr):
        xin = x + cr.astype(x.dtype)
        out = pl.pallas_call(
            dot_res_kernel,
            grid=(b, nc),
            in_specs=[
                pl.BlockSpec((1, t * mp, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows2, 128), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t * mp, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((t * mp + 2 * lead, 128), jnp.bfloat16),
                pltpu.VMEM((rows_x, 128), jnp.bfloat16)],
        )(xin, w)
        return out, jnp.sum(out[0, 0].astype(jnp.float32))

    # ---------------- manual HBM->VMEM ping-pong DMA -------------------
    def dot_dma_kernel(x_ref, w_ref, o_ref, xa_ref, xb_ref, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def start(jj, dst_ref, slot):
            pltpu.make_async_copy(
                x_ref.at[i, pl.ds(jj * rows2, rows_al)],
                dst_ref, sem.at[slot]).start()

        @pl.when(j == 0)
        def _():
            start(0, xa_ref, 0)

        def compute(src_ref):
            acc = jnp.zeros((rows2, 128), jnp.float32)
            for s in range(3):
                o = d + s * mp
                acc = acc + jax.lax.dot_general(
                    src_ref[o:o + rows2], w_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[0] = acc.astype(o_ref.dtype)

        @pl.when(j % 2 == 0)
        def _():
            pltpu.make_async_copy(
                x_ref.at[i, pl.ds(j * rows2, rows_al)],
                xa_ref, sem.at[0]).wait()

            @pl.when(j + 1 < nc)
            def _():
                start(j + 1, xb_ref, 1)

            compute(xa_ref)

        @pl.when(j % 2 == 1)
        def _():
            pltpu.make_async_copy(
                x_ref.at[i, pl.ds(j * rows2, rows_al)],
                xb_ref, sem.at[1]).wait()

            @pl.when(j + 1 < nc)
            def _():
                start(j + 1, xa_ref, 0)

            compute(xb_ref)

    def f_dma(x, cr):
        xin = x + cr.astype(x.dtype)
        # aligned zero pad so window starts are always j*rows2
        xin = jnp.pad(xin, ((0, 0), (lead_al, lead_al), (0, 0)))
        out = pl.pallas_call(
            dot_dma_kernel,
            grid=(b, nc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows2, 128), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t * mp, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((rows_al, 128), jnp.bfloat16),
                pltpu.VMEM((rows_al, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,))],
        )(xin, w)
        return out, jnp.sum(out[0, 0].astype(jnp.float32))

    # -------- resident + async VMEM->VMEM ping-pong staging ------------
    def dot_vv_kernel(x_ref, w_ref, o_ref, xp_ref, xa_ref, xb_ref, sem):
        j = pl.program_id(1)

        def start(jj, dst_ref, slot):
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(jj * rows2, rows_x)],
                dst_ref, sem.at[slot]).start()

        @pl.when(j == 0)
        def _():
            xp_ref[0:lead] = jnp.zeros((lead, 128), xp_ref.dtype)
            xp_ref[pl.ds(lead, t * mp)] = x_ref[0]
            xp_ref[pl.ds(lead + t * mp, lead)] = jnp.zeros(
                (lead, 128), xp_ref.dtype)
            start(0, xa_ref, 0)

        def compute(src_ref):
            acc = jnp.zeros((rows2, 128), jnp.float32)
            for s in range(3):
                acc = acc + jax.lax.dot_general(
                    src_ref[s * mp:s * mp + rows2], w_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o_ref[0] = acc.astype(o_ref.dtype)

        @pl.when(j % 2 == 0)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * rows2, rows_x)], xa_ref,
                sem.at[0]).wait()

            @pl.when(j + 1 < nc)
            def _():
                start(j + 1, xb_ref, 1)

            compute(xa_ref)

        @pl.when(j % 2 == 1)
        def _():
            pltpu.make_async_copy(
                xp_ref.at[pl.ds(j * rows2, rows_x)], xb_ref,
                sem.at[1]).wait()

            @pl.when(j + 1 < nc)
            def _():
                start(j + 1, xa_ref, 0)

            compute(xb_ref)

    def f_vv(x, cr):
        xin = x + cr.astype(x.dtype)
        out = pl.pallas_call(
            dot_vv_kernel,
            grid=(b, nc),
            in_specs=[
                pl.BlockSpec((1, t * mp, 128), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rows2, 128), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, t * mp, 128), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((t * mp + 2 * lead, 128), jnp.bfloat16),
                pltpu.VMEM((rows_x, 128), jnp.bfloat16),
                pltpu.VMEM((rows_x, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,))],
        )(xin, w)
        return out, jnp.sum(out[0, 0].astype(jnp.float32))

    try:
        rc = np.asarray(jax.jit(f_vv)(x2, jnp.float32(0))[0])
        vv_ok = True
    except Exception as e:  # noqa: BLE001
        print(f"vmem-vmem async: FAILED {type(e).__name__}: {str(e)[:300]}")
        vv_ok = False

    try:
        ra = np.asarray(jax.jit(f_dma)(x2, jnp.float32(0))[0])
    except Exception as e:  # noqa: BLE001
        print(f"manual DMA: FAILED {type(e).__name__}: {str(e)[:300]}")
        return
    rb = np.asarray(jax.jit(f_res)(x2, jnp.float32(0))[0])
    print(f"dot parity dma-vs-resident: "
          f"{np.abs(ra.astype(np.float32) - rb.astype(np.float32)).max():.2e}")
    if vv_ok:
        print(f"dot parity vv-vs-resident : "
              f"{np.abs(rc.astype(np.float32) - rb.astype(np.float32)).max():.2e}")
    ms_d = timeit(jax.jit(f_dma), (x2,))
    ms_r = timeit(jax.jit(f_res), (x2,))
    print(f"manual HBM DMA ping-pong   : {ms_d:6.2f} ms")
    print(f"resident + sync copy       : {ms_r:6.2f} ms")
    if vv_ok:
        ms_v = timeit(jax.jit(f_vv), (x2,))
        print(f"resident + async VV pingpong: {ms_v:6.2f} ms")


if __name__ == "__main__":
    main()
