"""Round-5 on-chip queue, part D: bf16-block1 tuning + batch sweep.

Runs after chip_playbook_r5c (the in-model TTG_B1_QUANT A/B):

  - probe_block1_bf16: stage bisect + tc sweep of the bf16 pair kernel
  - bench BENCH_BATCH sweep under the winning block1 config (the B=128
    sweet spot was measured with int8 block1; the optimum may shift)

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import os
import subprocess
import time

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
    log = open("/tmp/chip_playbook_r5d.log", "a")

    def emit(msg):
        print(msg, flush=True)
        log.write(msg + "\n")
        log.flush()

    emit(f"==== chip playbook r5d @ {time.ctime()} ====")
    for idx, (name, env, cmd, tmo) in enumerate(STEPS):
        emit(f"\n---- {name}: {' '.join(cmd)} env={env} ----")
        t0 = time.time()
        step_log = f"/tmp/chip_playbook_r5d_step{idx}.log"
        with open(step_log, "w") as lf:
            proc = subprocess.Popen(
                cmd, env={**os.environ, **env}, cwd="/root/repo",
                stdout=lf, stderr=subprocess.STDOUT, text=True)
            warned = False
            while proc.poll() is None:
                if not warned and time.time() - t0 > tmo:
                    emit(f"[soft deadline {tmo}s passed — NOT killing; "
                         f"still waiting, log: {step_log}]")
                    warned = True
                time.sleep(5)
        tail = open(step_log).read().strip().splitlines()
        emit("\n".join(tail[-30:]))
        if proc.returncode != 0:
            emit(f"[exit {proc.returncode}]")
        emit(f"[{time.time() - t0:.0f}s]")
    emit(f"==== done @ {time.ctime()} ====")


if __name__ == "__main__":
    main()
