"""A/B the block1 pair kernel's triple-store vs single-store modes.

Round-5 serving attack (VERDICT r4 item 2): the pair kernel's ~5 ms
serialized VPU epilogue is dominated by the conv2 triple-store (~3.2 GB
of register->VMEM stores per batch).  ``mode="single"`` stores y1 once
per mel-pair block (halo layout) and runs conv2 as three acc-chained
K=4C=256 global-row-offset dots instead of one K=12C=768 dot — trading
~3x less store traffic for a lower int8 dot rate (157 vs 240 TOP/s at
these shapes, scripts/probe_nk_matrix.py).  This probe measures both
modes standalone at serving geometry AND end-to-end via bench.py-style
in-model timing.

Usage: python scripts/probe_block1_single.py [standalone|e2e]
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

    for mode in ("triple", "single"):
        for quant in (True, "conv1", False):
            @jax.jit
            def f(x, cr, mode=mode, quant=quant):
                out = fused_block1_pair(
                    x + cr.astype(x.dtype) * 1e-9, w1, ab1, w2, ab2,
                    quantize=quant, mode=mode)
                return out, jnp.sum(out[0, 0, 0].astype(jnp.float32))

            ms = timeit(f, (x,))
            tag = {True: "int8", False: "bf16", "conv1": "mix1"}[quant]
            print(f"block1-pair [{mode:6s} {tag}]: {ms:7.2f} ms "
                  f"({B * 1000 / ms:7.1f} clips/s standalone)",
                  flush=True)


if __name__ == "__main__":
    main()
