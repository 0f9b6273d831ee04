"""Serving-shape autotuner: find the fastest clip length for this chip.

Sweeps candidate clips-per-step values (S = clips * time_dims frames per
dispatch) over the real streaming serving step and reports each one's
throughput and latency, then the winner. Longer steps amortize fixed
per-step costs (scan setup, kernel launches, the recurrence's sequential
tail) but cost dispatch latency; the optimum is chip- and host-specific
(S=80 on the v5e this repo was tuned on — docs/PERF.md).

Methodology matches bench.py (docs/PERF.md "Measurement integrity"):
chained donated state, per-region HOST SCALAR FETCH sync (block_until_ready
returns early through the axon relay), best-of-N repeats (stalls only add
time). Run tools/relay_health.py first; numbers taken during a relay
program-load stall are garbage.

Also sweeps the V axis (`--video-candidates 1,2,4`): V videos stream in
lock-step through the model's batch dimension; aggregate chip throughput can
beat V=1 when per-step fixed costs dominate, at the price of per-stream
latency. The winner is the (clips, videos) pair with the highest aggregate
FPS.

Usage:
    python tools/autotune_serving.py [--candidates 4,8,16,32]
        [--video-candidates 1,2,4] [--height 360] [--width 640]
        [--dtype bf16] [--steps 12] [--bake true]
        [--objective fps|latency] [--fps-floor 150] [--dispatches 300]

`--bake true` (default) tunes the baked-constant step — the form
production single-chip serving runs; `--bake false` tunes the
argument-passing step (the multi-chip / AB-comparison form).

`--objective latency` switches the metric to per-dispatch
request->response p99 (runners.latency: the output is host-fetched every
dispatch — what a real-time consumer waits for) and picks the candidate
with the LOWEST p99 among those sustaining at least `--fps-floor` FPS.
Small S wins latency, large S wins throughput; the floor is how you name
your point on that frontier (docs/PERF.md "Latency frontier").

Prints one JSON line:
  {"objective": ..., "best_clips": N, "best_videos": V, "best_fps": F,
   ["best_p99_ms": ...,] "results": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_step(model, variables, h, w, videos, compute_dtype, bake):
    """Serving step + priors/state for one shape; returns (step, state) with
    `step(x, st) -> (out, st)` (params already bound, baked or argument)."""
    import jax
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.parallel.steps import (
        make_baked_infer_step,
        make_infer_step,
    )

    rng = np.random.RandomState(0)
    gauss = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
    ob = jnp.asarray(rng.rand(h // 8, w // 8, 20).astype(np.float32))
    state = model.init_state(h, w, videos)
    if compute_dtype is not None:
        gauss, ob, state = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == jnp.float32 else a, t
            )
        )((gauss, ob, state))

    if bake:
        baked = make_baked_infer_step(model, variables, gauss=gauss, ob=ob,
                                      compute_dtype=compute_dtype,
                                      donate_state=True)
        step = lambda x, st: baked(x, st)  # noqa: E731
    else:
        infer = make_infer_step(model, compute_dtype=compute_dtype,
                                donate_state=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        step = lambda x, st: infer(  # noqa: E731
            params, batch_stats, x, gauss, ob, st)
    return step, state


def measure_streaming(model, variables, h, w, clips, time_dims, videos,
                      steps, repeats, compute_dtype, bake=True):
    """Best-of-N streaming FPS for one serving shape (bench.py methodology).

    `bake=True` (default) measures the baked-constant step — the form
    production single-chip serving actually runs (`test_videos`
    bake_params=True); the +11.7% baked delta is shape-dependent (it folds
    the constant-prior conv stack, whose relative cost varies with S and V),
    so tuning the argument-passing step can pick the wrong winner."""
    import jax.numpy as jnp

    s = clips * time_dims
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (videos, s, h, w, 3), np.uint8))
    step, st = _build_step(model, variables, h, w, videos, compute_dtype, bake)

    out, st = step(x, st)
    for _ in range(2):  # warmup
        out, st = step(x, st)
    float(out.astype(jnp.float32).sum())  # true sync

    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        for _ in range(steps):
            out, st = step(x, st)
        float(out.astype(jnp.float32).sum())
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {
        "clips": clips,
        "frames_per_step": videos * s,
        "fps": round(steps * videos * s / dt, 1),
        "ms_per_step": round(dt / steps * 1e3, 2),
    }


def measure_latency(model, variables, h, w, clips, time_dims, videos,
                    dispatches, compute_dtype, bake=True):
    """Per-dispatch request->response percentiles for one serving shape
    (runners.latency methodology: output host-fetched EVERY dispatch,
    state chained, relay stalls kept in the tail)."""
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.runners.latency import (
        latency_summary, measure_dispatch_latency,
    )

    s = clips * time_dims
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (videos, s, h, w, 3), np.uint8))
    step, st = _build_step(model, variables, h, w, videos, compute_dtype, bake)
    times = measure_dispatch_latency(step, x, st, n=dispatches)
    summ = latency_summary(times, frames_per_dispatch=videos * s)
    summ.update(clips=clips, frames_per_step=videos * s,
                fps=summ["fps_sustained"])
    return summ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", default="4,8,16,32",
                    help="comma-separated clips-per-step values to sweep")
    ap.add_argument("--video-candidates", default=None,
                    help="comma-separated V (parallel videos) values to sweep")
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--time-dims", type=int, default=5)
    ap.add_argument("--videos", type=int, default=1,
                    help="single V to measure (alias for --video-candidates V)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--bake", choices=["true", "false"], default="true",
                    help="measure the baked-constant serving step (the "
                         "production default); false measures the "
                         "argument-passing step")
    ap.add_argument("--objective", choices=["fps", "latency"], default="fps",
                    help="fps: max sustained throughput (loop-sync "
                         "measurement). latency: min p99 ms/dispatch "
                         "(per-dispatch host-fetch measurement) subject to "
                         "--fps-floor")
    ap.add_argument("--fps-floor", type=float, default=0.0,
                    help="latency objective: discard candidates whose "
                         "sustained FPS is below this floor")
    ap.add_argument("--dispatches", type=int, default=300,
                    help="latency objective: dispatches sampled per candidate")
    args = ap.parse_args()
    args.bake = args.bake == "true"
    # --videos is the pre-sweep spelling: it must keep controlling what gets
    # MEASURED, so it becomes the candidate list unless one was given
    if args.video_candidates is None:
        args.video_candidates = str(args.videos)
    elif args.videos != 1:
        ap.error("pass either --videos V or --video-candidates V1,V2,... (not both)")

    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables

    h, w, t = args.height, args.width, args.time_dims
    compute_dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    model = UAVSal(time_dims=t)
    rng = np.random.RandomState(0)
    # V=1 init: params are V-independent, so don't compile a V>1 init
    # program that the sweep never measures
    x0 = jnp.asarray(rng.rand(1, t, h, w, 3).astype(np.float32))
    gauss = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
    ob = jnp.asarray(rng.rand(h // 8, w // 8, 20).astype(np.float32))
    st0 = model.init_state(h, w, 1)
    variables = init_variables(model, jax.random.PRNGKey(0), x0, gauss, ob, st0)
    if compute_dtype is not None:
        variables = jax.jit(
            lambda v: jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if a.dtype == jnp.float32 else a, v
            )
        )(variables)

    results = {}
    for videos in [int(v) for v in args.video_candidates.split(",")]:
        for clips in [int(c) for c in args.candidates.split(",")]:
            if args.objective == "latency":
                r = measure_latency(
                    model, variables, h, w, clips, t, videos,
                    args.dispatches, compute_dtype, bake=args.bake,
                )
                line = (f"clips={clips:3d} V={videos} (S={clips * t:4d}): "
                        f"p50 {r['p50_ms']:7.2f}  p99 {r['p99_ms']:7.2f} "
                        f"ms/dispatch  sustained {r['fps']:7.1f} FPS")
            else:
                r = measure_streaming(
                    model, variables, h, w, clips, t, videos,
                    args.steps, args.repeats, compute_dtype, bake=args.bake,
                )
                line = (f"clips={clips:3d} V={videos} (S={clips * t:4d}): "
                        f"{r['fps']:7.1f} FPS  {r['ms_per_step']:7.2f} ms/step")
            r["videos"] = videos
            results[f"c{clips}_v{videos}"] = r
            print(line, file=sys.stderr, flush=True)

    if args.objective == "latency":
        # min p99 subject to the throughput floor; if nothing clears the
        # floor, fall back to max FPS (and say so) rather than erroring —
        # the operator still learns the frontier from `results`
        eligible = [r for r in results.values() if r["fps"] >= args.fps_floor]
        if eligible:
            best = min(eligible, key=lambda r: r["p99_ms"])
        else:
            best = max(results.values(), key=lambda r: r["fps"])
            print(f"WARNING: no candidate sustains {args.fps_floor} FPS; "
                  f"reporting the max-FPS shape instead", file=sys.stderr)
        extra = {"best_p99_ms": best["p99_ms"], "fps_floor": args.fps_floor}
    else:
        best = max(results.values(), key=lambda r: r["fps"])
        extra = {}
    print(json.dumps({
        "objective": args.objective,
        "best_clips": best["clips"],
        "best_videos": best["videos"],
        "best_fps": best["fps"],
        **extra,
        "results": results,
    }))


if __name__ == "__main__":
    main()
