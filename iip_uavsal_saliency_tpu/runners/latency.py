"""Per-dispatch serving-latency measurement: request->response percentiles.

The throughput story (bench.py default) syncs once per timed LOOP — honest
for sustained FPS because per-step dispatches serialize on the device
queue, but it says nothing about what ONE caller waits for ONE clip. A
real-time UAV consumer (the reference paper's stated motivation,
reference: README.md:104's FPS point is its only latency story) cares
about request->response: dispatch the clip, get the saliency map back on
the host. That round trip is what this measures, per dispatch, over
enough dispatches for the tail to mean something.

Methodology (docs/PERF.md "Measurement integrity"):
- each dispatch is synced by FETCHING THE OUTPUT to host (`np.asarray`) —
  `block_until_ready` returns early through the axon relay, and a serving
  caller needs the map on the host anyway, so the fetch IS part of the
  latency;
- the carried recurrent state stays on device and chains forward
  (true streaming);
- no trimming: relay stalls land in the recorded samples, and the
  percentile summary reports them (on this relay host the tail IS the
  story — see docs/PERF.md "Latency frontier").
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np


def measure_dispatch_latency(step, x, state, *, n: int = 1000,
                             warmup: int = 20) -> List[float]:
    """Per-dispatch request->response seconds for `step(x, state) ->
    (out, state)` over `n` chained dispatches (state flows forward; the
    output is host-fetched every step)."""
    out, st = step(x, state)
    np.asarray(out)  # compile + first fetch
    for _ in range(warmup):
        out, st = step(x, st)
    np.asarray(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out, st = step(x, st)
        np.asarray(out)  # host fetch = the response the caller waits for
        times.append(time.perf_counter() - t0)
    return times


def latency_summary(times_s: List[float], frames_per_dispatch: int) -> Dict:
    """Percentile summary in ms/dispatch + the sustained FPS implied by the
    mean (sum/n): p50 is the typical wait, p99/max carry the relay-stall
    tail, `fps_sustained` is what the same loop delivers as throughput."""
    a = np.asarray(times_s, np.float64) * 1e3
    q = lambda p: float(np.percentile(a, p))  # noqa: E731
    return {
        "n": int(a.size),
        "p50_ms": round(q(50), 3),
        "p90_ms": round(q(90), 3),
        "p95_ms": round(q(95), 3),
        "p99_ms": round(q(99), 3),
        "max_ms": round(float(a.max()), 3),
        "mean_ms": round(float(a.mean()), 3),
        "fps_sustained": round(frames_per_dispatch / (a.mean() / 1e3), 1),
    }
