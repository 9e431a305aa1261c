"""Tracing / profiling utilities.

The reference's observability is wall-clock prints and tqdm bars
(SURVEY §5: robust_mf.py:292,405, cnn_pred_pipeline.py:174). Here:
structured stage timers plus a hook into the JAX profiler (TensorBoard
trace format) for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["StageTimer", "device_trace"]


class StageTimer:
    """Named stage timing with a report table.

    with timer.stage("moments"): ...
    print(timer.report())
    """

    def __init__(self):
        self.stages: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def total(self) -> float:
        return sum(t for _, t in self.stages)

    def report(self) -> str:
        total = self.total() or 1e-12
        lines = [f"{name:<28s} {t:8.3f}s {100 * t / total:5.1f}%"
                 for name, t in self.stages]
        lines.append(f"{'total':<28s} {total:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX/XLA device trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
