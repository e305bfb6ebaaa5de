"""Round-5 on-chip queue, part B: the fused train-BN+relu+pool kernel.

Usage: python scripts/chip_playbook_r5b.py

  - block1 chain probe: XLA vs TTG_BN_POOL=64 vs TTG_POOL_VJP=64
  - full bf16 train step with the kernel at block1 only / all blocks
  - convergence A/B with the kernel on (trajectory equality)
  - the bf16-GRU standalone number part A missed (argv handling)

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("block1 chain xla/bnpool/poolvjp", {},
     ["python", "scripts/probe_block1_chain.py"], 2400),
    ("train profile bnpool b1", {"TTG_BN_POOL": "64"},
     ["python", "scripts/profile_train.py"], 2400),
    ("train profile bnpool all", {"TTG_BN_POOL": "64,128,256,512"},
     ["python", "scripts/profile_train.py"], 2400),
    ("gru bwd bf16 standalone", {},
     ["python", "scripts/probe_gru_bwd_r4.py", "bf16"], 2400),
    ("convergence A/B bnpool", {"TTG_BN_POOL": "64,128,256,512"},
     ["python", "scripts/ab_gru_convergence.py"], 2400),
]


def main():
    run_steps('r5b', STEPS)


if __name__ == "__main__":
    main()
