"""Run the queued on-chip measurements in order (one device claim at a
time), logging everything — the recovery playbook for when the axon
tunnel comes back after an outage.

Usage: python scripts/chip_playbook.py [quick|full]

Each step is a subprocess (fresh device claim, settled timing); output
accumulates in /tmp/chip_playbook.log and is echoed.  Steps:
  1. bench.py                     — serving baseline after the grouped GRU
  2. bench.py TTG_PALLAS_GRU=1    — Pallas GRU recurrence
  3. bench.py TTG_WINO=1          — Winograd blocks 3-4 (int8 default)
  4. scripts/bench_wino.py        — per-block wino vs direct9 vs XLA
  5. scripts/profile_train.py     — train-step timings (grouped GRU)
  6. scripts/int8_parity_scale.py — only in 'full' mode (trains 25 epochs)
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("bench default", {}, ["python", "bench.py"], 1800),
    ("bench pallas-gru", {"TTG_PALLAS_GRU": "1"}, ["python", "bench.py"],
     1800),
    ("bench wino", {"TTG_WINO": "1"}, ["python", "bench.py"], 1800),
    ("bench wino+gru", {"TTG_WINO": "1", "TTG_PALLAS_GRU": "1"},
     ["python", "bench.py"], 1800),
    ("per-block wino", {}, ["python", "scripts/bench_wino.py"], 2400),
    ("train profile", {}, ["python", "scripts/profile_train.py"], 2400),
    ("train profile pallas-gru", {"TTG_PALLAS_GRU": "1"},
     ["python", "scripts/profile_train.py"], 2400),
]
FULL_STEPS = [
    ("int8 parity at scale", {"TTG_FUSED_CONV": "int8"},
     ["python", "scripts/int8_parity_scale.py"], 3600),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    steps = STEPS + (FULL_STEPS if mode == "full" else [])
    run_steps('', steps)


if __name__ == "__main__":
    main()
