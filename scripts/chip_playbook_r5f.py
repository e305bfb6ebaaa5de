"""Round-5 on-chip queue, part F: mixed block1 default-flip confirm +
stage/tc envelope.

chip_playbook_r5e measured: standalone triple-store block1 int8 12.46 /
mixed 9.76 / bf16 9.97 ms; in-model bench 4269.0 clips/s under
TTG_B1_QUANT=mixed vs 4248.0 bf16 default; verify_e2e_tpu green under
mixed (PSDS 0.9135 = f32, max |dframe_sim| 0.0034).  The default is
now flipped to mixed; this queue (a) confirms the flip routes in
bench.py, (b) bisects the mixed kernel's stages and sweeps tc (the
conv1 dot is row-starved at 50 rows; int8 made rows cheaper, so the
chunk optimum may have moved), and (c) tries the best non-48 tc
in-model via TTG_B1_TC.

Steps run as subprocesses to completion — NEVER timeout-killed
(mid-claim SIGKILL wedges the axon relay; CLAUDE.md host-side pitfalls).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from _playbook import run_steps  # noqa: E402

STEPS = [
    ("bench new-default (mixed)", {}, ["python", "bench.py"], 2400),
    ("block1 mixed stages+tc", {},
     ["python", "scripts/probe_block1_mixed.py"], 2400),
    ("bench mixed tc=64", {"TTG_B1_TC": "64"}, ["python", "bench.py"],
     2400),
]


def main():
    run_steps('r5f', STEPS)


if __name__ == "__main__":
    main()
