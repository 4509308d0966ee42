"""Tracing / profiling utilities (SURVEY.md §5.1 parity, TPU edition).

The reference wires three mechanisms: proton intra-kernel roofline hooks,
torch.profiler chrome traces, and nsight (§5.1).  TPU equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing an
  xplane/perfetto trace dir (the chrome-trace analog; load in
  ui.perfetto.dev or TensorBoard).
* :func:`annotate` — ``TraceAnnotation`` for host-side named regions
  (the proton scope analog).
* :class:`StepTimer` — lightweight wall-clock step timing with quantile
  summaries matching the bench protocol (warmup skip + quantiles
  [0.5, 0.2, 0.8], reference benchmark.py:144).
* Kernel flops/bytes come from each kernel's ``pl.CostEstimate`` (declared
  at the pallas_call, the launch_metadata analog); the roofline math lives
  in benchmarks/roofline.py.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax profiler trace (xplane + perfetto) to ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host region that shows up on the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times; quantile summary like the bench
    protocol (quantiles [0.5, 0.2, 0.8])."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> dict[str, float]:
        timed = self.times[self.warmup:] or self.times
        qs = np.quantile(timed, [0.5, 0.2, 0.8])
        return {
            "steps": len(timed),
            "ms": qs[0] * 1e3,
            "min_ms": qs[1] * 1e3,
            "max_ms": qs[2] * 1e3,
            "total_s": float(np.sum(timed)),
        }
