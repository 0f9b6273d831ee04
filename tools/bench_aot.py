"""Measure AOT-artifact serving vs the live step on the current backend.

Exports the flagship serving shape (random-init weights — FPS does not
depend on values), loads it back through ExportedServing, and times both
paths with bench.py's methodology (chained state, HOST SCALAR FETCH sync,
best-of-N). On a TPU host the export bakes the fused Pallas TWA kernel, so
the artifact should match the live path's throughput; this tool verifies
that claim instead of assuming it (docs/PERF.md "Measurement integrity").

    python tools/bench_aot.py [--clips 16] [--steps 30] [--repeats 3]

Prints one JSON line:
  {"aot_fps": F, "live_fps": F, "artifact_mb": M, "first_call_s": S}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stream(step, x, state, steps, repeats):
    import jax.numpy as jnp

    out, st = step(x, state)
    for _ in range(3):
        out, st = step(x, st)
    float(out.astype(jnp.float32).sum())  # true sync
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for _ in range(steps):
            out, st = step(x, st)
        float(out.astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--time-dims", type=int, default=5)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--out", default="/tmp/uavsal_bench.aot")
    args = ap.parse_args()

    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
    from iip_uavsal_saliency_tpu.parallel.steps import make_infer_step
    from iip_uavsal_saliency_tpu.runners.export import (
        ExportedServing, export_serving, save_exported,
    )

    h, w, t = args.height, args.width, args.time_dims
    s = args.clips * t
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    print(f"device: {jax.devices()[0].device_kind}; S={s} {args.dtype}",
          file=sys.stderr, flush=True)

    model = UAVSal(time_dims=t)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.rand(1, t, h, w, 3).astype(np.float32))
    gauss = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
    ob = jnp.asarray(rng.rand(h // 8, w // 8, 20).astype(np.float32))
    st0 = model.init_state(h, w, 1)
    variables = init_variables(model, jax.random.PRNGKey(0), x0, gauss, ob, st0)

    exported, meta = export_serving(
        model, variables, iosize=(h, w, h // 8, w // 8), batch_size=args.clips,
        time_dims=t, gauss=gauss, ob=ob, compute_dtype=dtype,
    )
    save_exported(args.out, exported, meta)
    mb = os.path.getsize(args.out) / 1e6
    print(f"artifact: {mb:.1f} MB ({meta['compute_dtype']})",
          file=sys.stderr, flush=True)

    x = jnp.asarray(rng.randint(0, 255, (1, s, h, w, 3), np.uint8))
    art = ExportedServing(args.out)
    t0 = time.perf_counter()
    out, st = art(x, art.init_state(h, w, 1))
    float(out.astype(jnp.float32).sum())
    first = time.perf_counter() - t0
    print(f"artifact first call (compile+run): {first:.1f}s",
          file=sys.stderr, flush=True)
    dt_aot = _stream(art, x, art.init_state(h, w, 1), args.steps, args.repeats)

    # live path, same session for an honest ratio
    if dtype is not None:
        cast = jax.jit(lambda v: jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v))
        lvars = cast(variables)
        lg, lo, lst = cast((gauss, ob, model.init_state(h, w, 1)))
    else:
        lvars, lg, lo, lst = variables, gauss, ob, model.init_state(h, w, 1)
    live = make_infer_step(model, compute_dtype=dtype)
    params, stats = lvars["params"], lvars.get("batch_stats", {})
    dt_live = _stream(lambda xx, ss: live(params, stats, xx, lg, lo, ss),
                      x, lst, args.steps, args.repeats)

    fps = lambda dt: round(args.steps * s / dt, 1)  # noqa: E731
    print(json.dumps({
        "aot_fps": fps(dt_aot),
        "live_fps": fps(dt_live),
        "artifact_mb": round(mb, 1),
        "first_call_s": round(first, 1),
    }))


if __name__ == "__main__":
    main()
