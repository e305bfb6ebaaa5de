"""Pool+pack kernel probe: block1's dual pool as ONE Pallas pass.

XLA's avg+max pool is two reduce_window passes over conv2's [B,T,64,64]
output (2.6 GB traffic; ~4 ms in-graph marginal).  Design under test:

* XLA hands the kernel a FREE contiguous view ``[B, T*16, 256]`` (rows =
  (t, mel-quad), lanes = 4 mels x 64 ch), so the kernel reads dot
  operands straight off the ref — no in-kernel lane merges (sublane->
  lane reshapes relayout; the round-3 failure mode);
* the mel-pair reduce crosses lane halves: done on the MXU as two K=256
  dots against constant sum/difference matrices, with
  ``max(a,b) = 0.5*((a+b) + |a-b|)``;
* time pairs via the middle-dim reshape trick (sublane-only);
* output is emitted ALREADY pair-packed ``[B, T/2*16, 128]`` for
  block2's pair kernel.

Measured via in-graph marginals after a real conv2 producer (the
variadic-pool probe methodology), plus a pure-copy kernel to calibrate
achievable stream rate at this geometry.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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


def _mats():
    eye = np.eye(64, dtype=np.float32)
    ms = np.zeros((256, 128), np.float32)
    md = np.zeros((256, 128), np.float32)
    for row, col, sgn in ((0, 0, 1), (64, 0, -1), (128, 64, 1),
                          (192, 64, -1)):
        ms[row:row + 64, col:col + 64] = eye
        md[row:row + 64, col:col + 64] = sgn * eye
    return jnp.asarray(ms, jnp.bfloat16), jnp.asarray(md, jnp.bfloat16)


def _pool_kernel(x_ref, ms_ref, md_ref, out_ref, *, tc: int, mq: int):
    v = x_ref[0]
    s = jax.lax.dot_general(v, ms_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d = jax.lax.dot_general(v, md_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    mx = 0.5 * (s + jnp.abs(d))
    sv = s.reshape(tc // 2, 2 * mq, 128)
    mv = mx.reshape(tc // 2, 2 * mq, 128)
    ssum = (sv[:, :mq] + sv[:, mq:]).reshape(tc // 2 * mq, 128)
    mmax = jnp.maximum(mv[:, :mq], mv[:, mq:]).reshape(tc // 2 * mq, 128)
    out_ref[0] = (ssum * 0.25 + mmax).astype(out_ref.dtype)


def pool_pack(x4, tc=250):
    """x4: [B, T, 64, 64] relu'd conv2 output → [B, T/2*16, 128]
    pair-packed pooled (avg+max 2x2)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    mq = m // 4
    x = x4.reshape(b, t * mq, 4 * c)        # free contiguous view
    msb, mdb = _mats()
    kern = functools.partial(_pool_kernel, tc=tc, mq=mq)
    return pl.pallas_call(
        kern,
        grid=(b, t // tc),
        in_specs=[
            pl.BlockSpec((1, tc * mq, 4 * c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tc // 2 * mq, 128),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t // 2 * mq, 128), x4.dtype),
    )(x, msb, mdb)


def _copy_kernel(x_ref, out_ref):
    out_ref[0] = x_ref[0]


def stream_copy(x4, tc=250):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, m, c = x4.shape
    mq = m // 4
    x = x4.reshape(b, t * mq, 4 * c)
    return pl.pallas_call(
        _copy_kernel,
        grid=(b, t // tc),
        in_specs=[pl.BlockSpec((1, tc * mq, 4 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tc * mq, 4 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x4.dtype),
    )(x4.reshape(b, t * mq, 4 * c))


def dual_pool_xla(x4, pool=(2, 2)):
    w = (1, pool[0], pool[1], 1)
    a = jax.lax.reduce_window(x4, jnp.asarray(0, x4.dtype), jax.lax.add,
                              w, w, "VALID")
    m = jax.lax.reduce_window(x4, jnp.asarray(-np.inf, x4.dtype),
                              jax.lax.max, w, w, "VALID")
    return a / 4 + m


def conv_bn_relu(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return jax.nn.relu(y * 1.01 + 0.01)


def main():
    b, t, m, c = 128, 1000, 64, 64
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (b, t, m, c), jnp.bfloat16) * 0.1
    k = jax.random.normal(rng, (3, 3, c, c), jnp.bfloat16) * 0.05

    def s(y):
        return jnp.sum(y[0, 0].astype(jnp.float32))

    def g_conv(x, carry):
        y = conv_bn_relu(x + carry.astype(x.dtype), k)
        return y, s(y)

    def g_xla(x, carry):
        y = dual_pool_xla(conv_bn_relu(x + carry.astype(x.dtype), k))
        return y, s(y)

    def g_pack(x, carry, tc):
        y = pool_pack(conv_bn_relu(x + carry.astype(x.dtype), k), tc=tc)
        return y, s(y)

    def g_copy(x, carry, tc):
        y = stream_copy(conv_bn_relu(x + carry.astype(x.dtype), k), tc=tc)
        return y, s(y)

    # parity
    ref = jax.jit(g_xla)(x0, jnp.float32(0.0))[0]
    got = jax.jit(lambda x, cr: g_pack(x, cr, 250))(x0, jnp.float32(0.0))[0]
    got4 = np.asarray(got).reshape(b, t // 2, 16, 2, 64).reshape(
        b, t // 2, 32, 64)
    d = np.max(np.abs(got4.astype(np.float32)
                      - np.asarray(ref).astype(np.float32)))
    print(f"parity max|diff| = {d:.3e}")

    t_conv = timeit(jax.jit(g_conv), (x0,))
    t_xla = timeit(jax.jit(g_xla), (x0,))
    print(f"conv alone        : {t_conv:6.2f} ms")
    print(f"conv+XLA dual pool: {t_xla:6.2f} ms  (marginal "
          f"{t_xla-t_conv:5.2f})")
    for tc in (100, 250, 500):
        if t % tc:
            continue
        t_cp = timeit(jax.jit(lambda x, cr, tc=tc: g_copy(x, cr, tc)), (x0,))
        t_pk = timeit(jax.jit(lambda x, cr, tc=tc: g_pack(x, cr, tc)), (x0,))
        gb = (b * t * m * c * 2 * 2) / 1e9
        print(f"tc={tc:3d}: conv+copy {t_cp:6.2f} (copy marginal "
              f"{t_cp-t_conv:5.2f}, {gb/(t_cp-t_conv)*1000:5.0f} GB/s)  "
              f"conv+pool_pack {t_pk:6.2f} (marginal {t_pk-t_conv:5.2f})")


if __name__ == "__main__":
    main()
