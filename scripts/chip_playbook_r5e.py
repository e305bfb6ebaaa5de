"""Round-5 on-chip queue, part E: mixed-quant block1 (int8 conv1 +
bf16 conv2).

The r5d bf16 stage bisect put block1's cost at conv1 3.37 / store 1.7 /
conv2 4.27 (bf16 peak) / pool 0.6 ms.  conv2 is at the bf16 dot
ceiling and all-int8 loses on the y1 requantize epilogue — but conv1's
dot alone should gain from int8 operands (K=192 int8 ~145 TOP/s vs
bf16 ~100, scripts/probe_nk_matrix.py) with NO kernel-side epilogue
cost (the x quantize is XLA-side, the weight-scale dequant folds into
the BN affine).  ``quantize="conv1"`` implements that.

Steps:
  - probe_block1_single: standalone triple/single x int8/mix1/bf16
  - bench TTG_B1_QUANT=mixed (in-model A/B vs the 4248 default)
  - verify_e2e_tpu.py under the mixed combo (train+eval+parity)

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("block1 standalone modes", {},
     ["python", "scripts/probe_block1_single.py"], 2400),
    ("bench b1-mixed", {"TTG_B1_QUANT": "mixed"},
     ["python", "bench.py"], 2400),
    ("verify e2e b1-mixed", {"TTG_B1_QUANT": "mixed"},
     ["python", "scripts/verify_e2e_tpu.py"], 3600),
]


def main():
    run_steps('r5e', STEPS)


if __name__ == "__main__":
    main()
