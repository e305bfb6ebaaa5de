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

import os
import subprocess
import sys
import time

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
    log = open("/tmp/chip_playbook_r5b.log", "a")

    def emit(msg):
        print(msg, flush=True)
        log.write(msg + "\n")
        log.flush()

    emit(f"==== chip playbook r5b @ {time.ctime()} ====")
    for idx, (name, env, cmd, tmo) in enumerate(STEPS):
        emit(f"\n---- {name}: {' '.join(cmd)} env={env} ----")
        t0 = time.time()
        step_log = f"/tmp/chip_playbook_r5b_step{idx}.log"
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
