"""Profiling / observability helpers.

TPU-native replacement for the reference's ad-hoc instrumentation (thop
MACs counting, pytorch_memlab — SURVEY §5): ``jax.profiler`` traces around
chosen training steps plus throughput counters in the epoch log.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a ``jax.profiler`` trace (TensorBoard format) for the
    enclosed block."""
    import jax
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Optionally traces steps [start, start+num) of training into
    ``exp_dir/profile`` (config: ``trainer.profile: {start_step, num_steps}``)."""

    def __init__(self, config: dict | None, exp_dir):
        config = config or {}
        self.start = config.get("start_step", 2)
        self.num = config.get("num_steps", 3)
        self.enabled = bool(config)
        self.log_dir = Path(exp_dir) / "profile"
        self._active = False

    def step(self, iteration: int) -> None:
        if not self.enabled:
            return
        import jax
        if iteration == self.start:
            self.log_dir.mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(str(self.log_dir))
            self._active = True
        elif self._active and iteration >= self.start + self.num:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


class ThroughputMeter:
    """Samples/sec + step-time accounting for the epoch log."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.samples = 0
        self.steps = 0
        self.t0 = time.time()

    def update(self, batch_size: int):
        self.samples += batch_size
        self.steps += 1

    def summary(self) -> str:
        dt = max(time.time() - self.t0, 1e-9)
        return (f"{self.samples / dt:.1f} samples/s, "
                f"{self.steps / dt:.2f} steps/s")
