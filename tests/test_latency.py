"""Unit tests for runners.latency: the per-dispatch request->response
measurement used by `bench.py --latency` and the autotuner's latency
objective (docs/PERF.md "Latency frontier"). Host-only — a fake step
stands in for the device so percentile math and the chaining/fetch
protocol are pinned without a TPU."""

import numpy as np

from iip_uavsal_saliency_tpu.runners.latency import (
    latency_summary,
    measure_dispatch_latency,
)


def test_latency_summary_percentiles_and_fps():
    # 1..1000 ms: percentiles are exact on this grid, mean is 500.5 ms
    times_s = [i / 1e3 for i in range(1, 1001)]
    s = latency_summary(times_s, frames_per_dispatch=5)
    assert s["n"] == 1000
    assert s["p50_ms"] == 500.5
    assert s["p90_ms"] == 900.1
    assert s["p99_ms"] == 990.01
    assert s["max_ms"] == 1000.0
    assert s["mean_ms"] == 500.5
    # sustained FPS is frames / mean dispatch time
    assert s["fps_sustained"] == round(5 / 0.5005, 1)


def test_latency_summary_tail_not_trimmed():
    # one relay stall must land in max (and drag the mean), not be dropped
    times_s = [0.010] * 99 + [120.0]
    s = latency_summary(times_s, frames_per_dispatch=80)
    assert s["max_ms"] == 120000.0
    assert s["p50_ms"] == 10.0
    assert s["mean_ms"] > 1000.0


class _FakeStep:
    """step(x, state) -> (out, state+1); records the states it was given so
    the test can prove the carry chained forward through every dispatch."""

    def __init__(self):
        self.seen = []

    def __call__(self, x, state):
        self.seen.append(int(state))
        return np.zeros((2, 2)), state + 1


def test_measure_dispatch_latency_chains_state_and_counts():
    step = _FakeStep()
    times = measure_dispatch_latency(step, x=None, state=0, n=7, warmup=3)
    assert len(times) == 7
    assert all(t >= 0 for t in times)
    # 1 compile call + 3 warmup + 7 timed, each fed the previous state
    assert step.seen == list(range(11))
