"""Stage bisect + tc sweep of the block1 pair kernel in bf16 mode.

Round-5: probe_block1_single found bf16 block1 beats int8 standalone
(10.20 vs 12.31 ms) — the int8 quantize epilogue costs more than the
int8 dot-rate gain at this geometry.  This probe maps where the bf16
variant's time goes (stages 1-4, quantize=False) and whether tc=48
(picked for int8, whose scratch bytes are half) is still the right
chunk for the 2-byte y9 scratch.

Usage: python scripts/probe_block1_bf16.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from probe_common import B, C, M, T, make_block1_case, timeit  # noqa: E402
from texttoaudiogrounding_tpu.ops.pallas.conv_block1_pair import (  # noqa: E402
    fused_block1_pair,
)

def main():
    x, w1, ab1, w2, ab2 = make_block1_case()

    for st in (1, 2, 3, 4):
        def f_k(x, cr, st=st):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize=False, tc=48, _stages=st)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_k), (x,))
            print(f"bf16 stage {st} tc=48      : {ms:6.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bf16 stage {st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for tc in (32, 48, 64):
        def f_tc(x, cr, tc=tc):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize=False, tc=tc)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_tc), (x,))
            print(f"bf16 full tc={tc:<3d}        : {ms:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bf16 tc={tc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
