"""Round-5 on-chip measurement queue (run when the axon tunnel is up).

Usage: python scripts/chip_playbook_r5.py [quick|full]

Covers the round-5 verdict items that need the real chip:
  - bf16-recurrence trainable BiGRU (VERDICT r4 item 3): step time vs
    the f32 Pallas backward + convergence A/B
  - block1-pair stage/fine bisection (item 2 groundwork: which part of
    the serving kernel's ~5 ms VPU epilogue carries the cost)
  - training profile with TTG_GRU_BWD=bf16 (does the bf16 recurrence
    move the 137 ms step?)
  - bench.py sanity re-measure (guard against config drift)

Each step runs as a subprocess to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("gru bwd bf16 vs cur", {},
     ["python", "scripts/probe_gru_bwd_r4.py", "cur", "bf16"], 2400),
    ("gru convergence A/B scan", {}, ["python",
     "scripts/ab_gru_convergence.py"], 2400),
    ("gru convergence A/B pallas-f32", {"TTG_PALLAS_GRU": "1"},
     ["python", "scripts/ab_gru_convergence.py"], 2400),
    ("gru convergence A/B pallas-bf16",
     {"TTG_PALLAS_GRU": "1", "TTG_GRU_BWD": "bf16"},
     ["python", "scripts/ab_gru_convergence.py"], 2400),
    ("train profile bf16-gru", {"TTG_GRU_BWD": "bf16"},
     ["python", "scripts/profile_train.py"], 2400),
    ("train profile default", {}, ["python", "scripts/profile_train.py"],
     2400),
    ("block1 pair stages", {}, ["python", "scripts/probe_block1_stages.py"],
     2400),
    ("block1 pair fine", {}, ["python", "scripts/probe_block1_fine.py"],
     2400),
    ("block1 single vs triple", {},
     ["python", "scripts/probe_block1_single.py"], 2400),
    ("bench default", {}, ["python", "bench.py"], 1800),
    ("bench single-store b1", {"TTG_B1_MODE": "single"},
     ["python", "bench.py"], 1800),
]
FULL_STEPS: list = []


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    steps = STEPS + (FULL_STEPS if mode == "full" else [])
    run_steps('r5', steps)


if __name__ == "__main__":
    main()
