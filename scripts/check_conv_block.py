"""Correctness check: fused_double_conv_pool vs XLA reference (CPU interpret)."""

import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from texttoaudiogrounding_tpu.ops.pallas.conv_block import (
    fused_double_conv_pool, fold_bn)


def xla_ref(x, w1, ab1, w2, ab2, pool):
    def conv(x, w, a, b):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(y * a + b, 0.0)

    y = conv(x.astype(jnp.float32), w1, *ab1)
    y = conv(y, w2, *ab2)
    win = (1, pool[0], pool[1], 1)
    avg = jax.lax.reduce_window(y, 0.0, jax.lax.add, win, win, "VALID") / (
        pool[0] * pool[1])
    mx = jax.lax.reduce_window(y, -np.inf, jax.lax.max, win, win, "VALID")
    return avg + mx


def main():
    rng = np.random.default_rng(0)
    for (t, m, cin, cout, pool) in [
            (20, 32, 64, 128, (2, 2)),
            (16, 16, 128, 256, (1, 2)),
            (12, 8, 256, 512, (1, 2))]:
        x = rng.normal(size=(2, t, m, cin)).astype(np.float32)
        w1 = (rng.normal(size=(3, 3, cin, cout)) * 0.05).astype(np.float32)
        w2 = (rng.normal(size=(3, 3, cout, cout)) * 0.05).astype(np.float32)
        ab1 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
               jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))
        ab2 = (jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32),
               jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32))

        ref = np.asarray(xla_ref(jnp.asarray(x), jnp.asarray(w1), ab1,
                                 jnp.asarray(w2), ab2, pool))
        scale = np.maximum(np.abs(ref), 1.0)

        got32 = np.asarray(fused_double_conv_pool(
            jnp.asarray(x), jnp.asarray(w1), ab1,
            jnp.asarray(w2), ab2, pool, compute_dtype=jnp.float32,
            interpret=True), np.float32)
        err32 = np.max(np.abs(got32 - ref) / scale)
        print(f"f32  T{t} M{m} {cin}->{cout} pool{pool}: rel err {err32:.2e}")
        assert err32 < 1e-4, err32

        got = np.asarray(fused_double_conv_pool(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), ab1,
            jnp.asarray(w2), ab2, pool, interpret=True),
            np.float32)
        err = np.max(np.abs(got - ref) / scale)
        print(f"bf16 T{t} M{m} {cin}->{cout} pool{pool}: rel err {err:.4f}")
        assert err < 0.15, err

        got_q = np.asarray(fused_double_conv_pool(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(w1), ab1,
            jnp.asarray(w2), ab2, pool, quantize=True, interpret=True),
            np.float32)
        err_q = np.max(np.abs(got_q - ref) / scale)
        print(f"int8 T{t} M{m} {cin}->{cout} pool{pool}: rel err {err_q:.4f}")
        assert err_q < 1.0, err_q  # informational on random weights
    print("OK")


if __name__ == "__main__":
    main()
