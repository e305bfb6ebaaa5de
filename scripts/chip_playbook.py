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

import os
import subprocess
import sys
import time

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
    log = open("/tmp/chip_playbook.log", "a")

    def emit(msg):
        print(msg, flush=True)
        log.write(msg + "\n")
        log.flush()

    emit(f"==== chip playbook {mode} @ {time.ctime()} ====")
    for idx, (name, env, cmd, tmo) in enumerate(steps):
        emit(f"\n---- {name}: {' '.join(cmd)} env={env} ----")
        t0 = time.time()
        # NEVER timeout-kill a TPU-claiming child (subprocess.run's
        # timeout SIGKILLs it mid-claim, which wedges the host-side
        # axon relay — CLAUDE.md).  Run it to completion; past the
        # soft deadline just warn and keep waiting (the next step
        # would block on the device claim anyway).
        step_log = f"/tmp/chip_playbook_step{idx}.log"
        with open(step_log, "w") as lf:
            proc = subprocess.Popen(
                cmd, env={**os.environ, **env}, cwd="/root/repo",
                stdout=lf, stderr=subprocess.STDOUT, text=True)
            warned = False
            while proc.poll() is None:
                if not warned and time.time() - t0 > tmo:
                    emit(f"[soft deadline {tmo}s passed — NOT killing "
                         f"(mid-claim SIGKILL wedges the tunnel); "
                         f"still waiting, log: {step_log}]")
                    warned = True
                time.sleep(5)
        tail = open(step_log).read().strip().splitlines()
        emit("\n".join(tail[-25:]))
        if proc.returncode != 0:
            emit(f"[exit {proc.returncode}]")
        emit(f"[{time.time() - t0:.0f}s]")


if __name__ == "__main__":
    main()
