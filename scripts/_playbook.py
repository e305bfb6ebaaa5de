"""Shared runner for the on-chip measurement playbooks.

Every ``scripts/chip_playbook*.py`` queues steps as subprocesses that
run to COMPLETION — never timeout-killed, because SIGKILLing a client
mid-TPU-claim wedges the host-side axon relay (ports 8082/8083 go
connection-refused and nothing inside the container can revive it;
CLAUDE.md host-side pitfalls).  Deadlines are soft: a warning is
emitted and the runner keeps waiting.  One chip = one process — steps
run strictly sequentially.

Usage from a playbook::

    from scripts._playbook import run_steps
    STEPS = [(name, extra_env, argv, soft_deadline_s), ...]
    run_steps("r5x", STEPS)

Logs: the combined narrative to ``/tmp/chip_playbook_<tag>.log`` plus
one ``/tmp/chip_playbook_<tag>_step<i>.log`` per step.
"""

from __future__ import annotations

import os
import subprocess
import time


def run_steps(tag: str, steps, cwd: str = "/root/repo") -> None:
    suffix = f"_{tag}" if tag else ""
    log = open(f"/tmp/chip_playbook{suffix}.log", "a")

    def emit(msg):
        print(msg, flush=True)
        log.write(msg + "\n")
        log.flush()

    emit(f"==== chip playbook {tag} @ {time.ctime()} ====")
    for idx, (name, env, cmd, tmo) in enumerate(steps):
        emit(f"\n---- {name}: {' '.join(cmd)} env={env} ----")
        t0 = time.time()
        step_log = f"/tmp/chip_playbook{suffix}_step{idx}.log"
        with open(step_log, "w") as lf:
            proc = subprocess.Popen(
                cmd, env={**os.environ, **env}, cwd=cwd,
                stdout=lf, stderr=subprocess.STDOUT, text=True)
            warned = False
            while proc.poll() is None:
                if not warned and time.time() - t0 > tmo:
                    emit(f"[soft deadline {tmo}s passed — NOT killing "
                         f"(mid-claim SIGKILL wedges the axon relay); "
                         f"still waiting, log: {step_log}]")
                    warned = True
                time.sleep(5)
        tail = open(step_log).read().strip().splitlines()
        emit("\n".join(tail[-30:]))
        if proc.returncode != 0:
            emit(f"[exit {proc.returncode}]")
        emit(f"[{time.time() - t0:.0f}s]")
    emit(f"==== done @ {time.ctime()} ====")
