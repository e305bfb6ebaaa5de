"""Round-5 on-chip queue, part C: bf16-block1 inside int8 serving.

probe_block1_single (chip_playbook_r5, 2026-08-20) measured the bf16
pair kernel FASTER than int8 standalone (10.20 vs 12.31 ms incl. XLA
prep) — the int8 quantize epilogue costs more than the int8 dot-rate
gain at block1's geometry.  This playbook answers "does it hold
in-model?" with a same-session A/B, plus the /verify drive:

  - bench.py default (int8 everywhere)            — the r4 config
  - bench.py TTG_B1_QUANT=0 (bf16 block1, int8 2-4)
  - verify_e2e_tpu.py with TTG_B1_QUANT=0          — train+eval+parity

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("bench default int8", {}, ["python", "bench.py"], 2400),
    ("bench b1-bf16", {"TTG_B1_QUANT": "0"}, ["python", "bench.py"], 2400),
    ("verify e2e b1-bf16", {"TTG_B1_QUANT": "0"},
     ["python", "scripts/verify_e2e_tpu.py"], 3600),
]


def main():
    run_steps('r5c', STEPS)


if __name__ == "__main__":
    main()
