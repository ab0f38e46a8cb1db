"""Lightweight phase timing & counters.

The reference's only observability is hash-transcript debug loggers
(SURVEY.md §5.1/§5.5) — kept here under the same logger names — plus this
module's phase timers, which the demos and bench CLI use for per-phase
wall-clock reporting (setup / prove / verify), and which can emit JAX
profiler traces around TPU phases.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("vmpc.profiling")


class Phases:
    """Collects named phase durations; print or export as dict."""

    def __init__(self):
        self.durations = {}
        self.order = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.durations[name] = self.durations.get(name, 0.0) + dt
            if name not in self.order:
                self.order.append(name)
            logger.debug("phase %s: %.3fs", name, dt)

    def report(self, file=None) -> str:
        lines = [f"{name:>24}: {self.durations[name]:8.3f}s" for name in self.order]
        text = "\n".join(lines)
        if file is not None:
            print(text, file=file)
        return text

    def as_dict(self):
        return dict(self.durations)


@contextlib.contextmanager
def jax_trace(log_dir: str):
    """Wrap a TPU phase in a JAX profiler trace (viewable in TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
