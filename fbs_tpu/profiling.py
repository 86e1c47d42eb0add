"""Profiling and throughput accounting.

The reference has no tracing or perf harness at all (SURVEY.md section 5);
this module provides the two first-class tools the TPU build needs:

- :func:`trace` — a context manager around ``jax.profiler`` trace capture
  (view with TensorBoard or xprof),
- :class:`ThroughputMeter` — wall-clock particle*step/s and sweeps/s counters
  with correct ``block_until_ready`` semantics.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List

import jax

__all__ = ["trace", "ThroughputMeter"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fbs_tpu_trace"):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Accumulates timing for repeated sampler sweeps.

    Usage::

        meter = ThroughputMeter(nparticles=100, nsteps=1000)
        with meter.measure():
            out = sweep(...)
            jax.block_until_ready(out)
        print(meter.summary())
    """
    nparticles: int
    nsteps: int
    times: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - t0)

    @property
    def sec_per_sweep(self) -> float:
        # Drop the first (compile) measurement when more are available.
        ts = self.times[1:] if len(self.times) > 1 else self.times
        return sum(ts) / max(len(ts), 1)

    @property
    def particle_steps_per_sec(self) -> float:
        return self.nparticles * self.nsteps / self.sec_per_sweep

    def summary(self) -> dict:
        return {
            "sweeps_measured": len(self.times),
            "sec_per_sweep": self.sec_per_sweep,
            "particle_steps_per_sec": self.particle_steps_per_sec,
            "sweeps_per_sec": 1.0 / self.sec_per_sweep,
        }
