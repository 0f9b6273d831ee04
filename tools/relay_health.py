"""Quick TPU-relay health probe.

The axon relay between this host and the TPU occasionally degrades —
dispatches that normally round-trip in tens of milliseconds stall for
seconds to minutes, then recover. Benchmarks taken during a stall are
garbage (docs/PERF.md "Measurement integrity"), so run this first:

    python tools/relay_health.py          # ~10 s when healthy

It reports the round-trip latency of a tiny cached program (pure relay +
dispatch, no compute to speak of) and a small matmul (adds one HBM-resident
step). Healthy: first-call < 5 s (cache hit), round-trips < 100 ms.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.asarray(np.random.RandomState(0).rand(256, 256).astype(np.float32))
    t0 = time.perf_counter()
    float(f(x))  # scalar fetch: the only trustworthy sync through the relay
    first = time.perf_counter() - t0

    # The first program may have paid a genuine cold-cache compile; judge
    # load health on a SECOND distinct trivial program, whose compile cost
    # is negligible next to a relay load stall.
    g = jax.jit(lambda x: (x + 1.0).sum())
    t0 = time.perf_counter()
    float(g(x))
    second = time.perf_counter() - t0
    first = min(first, second)

    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        rtts.append(time.perf_counter() - t0)
    med = sorted(rtts)[len(rtts) // 2]

    print(
        f"first call {first:.2f}s; round-trips "
        + ", ".join(f"{t * 1e3:.0f}ms" for t in rtts)
        + f" (median {med * 1e3:.0f}ms)"
    )
    # The two paths degrade INDEPENDENTLY (observed 2026-08-17): program
    # load/compile can stall for minutes while steady dispatch stays at
    # ~37 ms, and vice versa. Steady-state FPS numbers only need dispatch
    # health (the timed loop runs long after program load); first-call /
    # compile timings need load health.
    load_ok = first < 5.0
    disp_ok = med < 0.1
    print(("program-load OK" if load_ok else
           f"PROGRAM LOAD DEGRADED ({first:.0f}s) — first-call/compile "
           "timings untrustworthy; expect multi-minute bench startup")
          + "; "
          + ("dispatch OK" if disp_ok else
             f"DISPATCH DEGRADED ({med * 1e3:.0f}ms median) — do not trust "
             "any benchmark taken now"))
    return 0 if (load_ok and disp_ok) else 1


if __name__ == "__main__":
    sys.exit(main())
