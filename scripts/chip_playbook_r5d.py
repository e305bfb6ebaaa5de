"""Round-5 on-chip queue, part D: bf16-block1 tuning + batch sweep.

Runs after chip_playbook_r5c (the in-model TTG_B1_QUANT A/B):

  - probe_block1_bf16: stage bisect + tc sweep of the bf16 pair kernel
  - bench BENCH_BATCH sweep under the winning block1 config (the B=128
    sweet spot was measured with int8 block1; the optimum may shift)

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    # new default (bf16 block1 inside int8 serving) — confirms the
    # TTG_B1_QUANT default flip routes and reproduces r5c's 4240
    ("bench new-default B=128", {}, ["python", "bench.py"], 2400),
    ("block1 bf16 stages+tc", {},
     ["python", "scripts/probe_block1_bf16.py"], 2400),
    ("bench b1-bf16 B=144", {"BENCH_BATCH": "144"},
     ["python", "bench.py"], 2400),
    ("bench b1-bf16 B=160", {"BENCH_BATCH": "160"},
     ["python", "bench.py"], 2400),
    ("bench b1-bf16 B=192", {"BENCH_BATCH": "192"},
     ["python", "bench.py"], 2400),
]


def main():
    run_steps('r5d', STEPS)


if __name__ == "__main__":
    main()
