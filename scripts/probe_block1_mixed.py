"""Stage bisect + tc sweep of the block1 pair kernel in MIXED mode.

Round-5e: quantize="conv1" (int8 conv1 dot -> bf16 conv2) measured
9.76 ms standalone vs 9.97 bf16 / 12.46 all-int8.  This probe bisects
where the mixed variant's time goes and whether a larger tc (the conv1
dot is row-starved at tc+2 = 50 rows; int8 made it cheaper per row)
shifts the chunk optimum.

Usage: python scripts/probe_block1_mixed.py
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
                quantize="conv1", tc=48, _stages=st)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_k), (x,))
            print(f"mix1 stage {st} tc=48      : {ms:6.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mix1 stage {st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for tc in (32, 48, 64):
        def f_tc(x, cr, tc=tc):
            out = fused_block1_pair(
                x + cr.astype(x.dtype), w1, ab1, w2, ab2,
                quantize="conv1", tc=tc)
            return out, jnp.sum(out[0, 0].astype(jnp.float32))

        try:
            ms = timeit(jax.jit(f_tc), (x,))
            print(f"mix1 full tc={tc:<3d}        : {ms:6.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mix1 tc={tc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
