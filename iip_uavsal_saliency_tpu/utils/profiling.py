"""Profiling: per-stage wall timers + jax.profiler traces.

The reference only has time.time() prints in its eval loops
(reference: utils_score_torch.py:496-575). Here: a context-manager stage
timer with aggregate reporting, and a helper wrapping `jax.profiler.trace`
for XLA/TPU timeline captures viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    """Accumulates wall time per named stage.

    with timer("decode"): ...
    print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def report(self) -> str:
        lines = ["stage timing", "-" * 46]
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{k:<24s} {self.totals[k]:9.3f}s  x{self.counts[k]:<6d}"
                f" {self.totals[k] / max(self.counts[k], 1) * 1e3:8.2f} ms/call"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace_profile(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device trace: `with trace_profile('/tmp/t'): step(...)`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
