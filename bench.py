"""Headline benchmark: UAVSal inference throughput (frames/sec) on one chip.

Reference point: 85 FPS on a GTX10xx/RTX30xx-era GPU at reduced 288x512 input
(reference: README.md:104); base config is 360x640 in -> 45x80 out
(reference: Demo_Test.py:111). We benchmark the base 360x640 configuration —
a HARDER setting than the reference's 85 FPS point — and report
vs_baseline = fps / 85.

Prints exactly one JSON line on stdout:
  {"metric": "inference_fps_360x640", "value": N, "unit": "frames/sec",
   "vs_baseline": N}
Diagnostics go to stderr.

Methodology: steps are chained through the recurrent state (true streaming
serving); timing encloses the whole loop and ends with a HOST SCALAR FETCH
of the last output — `block_until_ready` returns early through the axon
relay, so a value fetch is the only trustworthy sync here (docs/PERF.md
"Measurement integrity"). `--in-graph` instead runs the loop inside one
jit over a pool of pre-staged clips: chip-bound throughput, no per-step
dispatch. Streaming runs at ~92% of chip-bound — the pipeline is
compute-bound.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--clips", type=int, default=None,
                    help="clips per step (batch_size); default 16 (S=80 "
                         "frames/step, the measured-fastest serving shape, "
                         "docs/PERF.md) or 1 in --latency mode (one clip "
                         "per dispatch, the real-time shape)")
    ap.add_argument("--time-dims", type=int, default=5)
    ap.add_argument("--videos", type=int, default=1, help="parallel videos (V axis)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed-loop repeats; the BEST is reported (guards "
                         "against transient relay degradation — the axon "
                         "tunnel occasionally stalls for seconds)")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16",
                    help="bf16 is the serving path (f32 for reference parity)")
    ap.add_argument("--twa", choices=["auto", "pallas", "xla"], default="auto",
                    help="TWA recurrence (auto picks the fused Pallas kernel "
                         "whenever supported — TPU + bf16; xla forces the scan)")
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem: exact 2x2 reparametrization of "
                         "the stride-2 stem conv (4x input-channel MXU "
                         "occupancy; ops.layers.S2DStem) — A/B probe")
    ap.add_argument("--bake", choices=["true", "false"], default="true",
                    help="bake params/priors into the program as constants "
                         "(the production serving form, +11.7%%); false "
                         "measures the argument-passing step")
    ap.add_argument("--baseline-fps", type=float, default=85.0)
    ap.add_argument("--in-graph", action="store_true",
                    help="run the step loop inside ONE jit (lax.scan over "
                         "steps): measures chip-bound throughput with no "
                         "per-step host dispatch (diagnostic, not the "
                         "serving headline — real serving feeds fresh "
                         "input per step)")
    ap.add_argument("--latency", action="store_true",
                    help="per-dispatch request->response latency mode: time "
                         "EVERY dispatch individually (output host-fetched "
                         "each step) over --lat-dispatches steps and report "
                         "p50/p90/p95/p99/max ms per dispatch. Defaults "
                         "--clips to 1 (S=5, one clip per dispatch — the "
                         "real-time serving shape) unless given explicitly. "
                         "Relay stalls land in the tail ON PURPOSE: the "
                         "percentiles are the honest sustained story "
                         "(docs/PERF.md 'Latency frontier').")
    ap.add_argument("--lat-dispatches", type=int, default=1000,
                    help="dispatches to sample in --latency mode")
    args = ap.parse_args()
    args.bake = args.bake == "true"
    if args.latency and args.in_graph:
        ap.error("--latency and --in-graph are mutually exclusive")
    # real-time latency defaults to one clip per dispatch (None sentinel,
    # not argv sniffing: argparse prefix-matching would defeat a scan)
    if args.clips is None:
        args.clips = 1 if args.latency else 16

    repo = os.path.dirname(os.path.abspath(__file__))
    # Shared cache policy (seed from the committed serving_cache/, stable
    # keys across processes): see utils/compile_cache.py for the measured
    # key-stability findings this encodes.
    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    seeded = setup_compile_cache(repo)
    if seeded:
        log(f"seeded {seeded} compile-cache entries from serving_cache/")
    import jax
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
    from iip_uavsal_saliency_tpu.parallel.steps import make_infer_step

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    h, w = args.height, args.width
    ho, wo = h // 8, w // 8
    s = args.clips * args.time_dims
    v = args.videos

    twa_pallas = {"auto": None, "pallas": True, "xla": False}[args.twa]
    if twa_pallas and args.dtype != "bf16":
        log("WARNING: --twa pallas needs --dtype bf16; the XLA scan will run instead")
    model = UAVSal(time_dims=args.time_dims, twa_pallas=twa_pallas,
                   s2d_stem=args.s2d)
    rng = np.random.RandomState(0)
    x_u8 = jnp.asarray(rng.randint(0, 255, (v, s, h, w, 3), np.uint8))
    gauss = jnp.asarray(rng.rand(ho, wo, 8).astype(np.float32))
    ob = jnp.asarray(rng.rand(ho, wo, 20).astype(np.float32))
    state = model.init_state(h, w, v)

    x_f = x_u8.astype(jnp.float32) / 255.0
    variables = init_variables(model, jax.random.PRNGKey(0), x_f, gauss, ob, state)
    compute_dtype = None
    if args.dtype == "bf16":
        compute_dtype = jnp.bfloat16
        # ONE jitted program for every cast: each eager tree_map cast would
        # be its own compiled program, and the relay's program-LOAD path is
        # the thing that stalls (docs/PERF.md "Measurement integrity" #3) —
        # dozens of tiny loads can cost minutes of startup during a stall.
        variables, gauss, ob, state = jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
            )
        )((variables, gauss, ob, state))

    # the serving loop overwrites the state every step: donate its buffer.
    # Default: params/stats/priors baked in as compile-time constants —
    # weights never change in serving, and the baked program measures
    # +11.7% over the argument-passing form (XLA folds the eval-BN affines
    # and precomputes the constant-prior conv stack; docs/PERF.md
    # "Baked-constant serving"). --bake false restores the argument form.
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if args.bake:
        from iip_uavsal_saliency_tpu.parallel.steps import make_baked_infer_step

        baked = make_baked_infer_step(
            model, variables, gauss=gauss, ob=ob,
            compute_dtype=compute_dtype, donate_state=True,
        )
        infer = lambda p, b, x, g, o, st: baked(x, st)  # noqa: E731
    else:
        infer = make_infer_step(model, compute_dtype=compute_dtype, donate_state=True)

    if args.latency:
        # request->response percentiles: every dispatch host-fetches the
        # saliency map (what a real-time consumer waits for); the recurrent
        # state chains on-device. Relay stalls are NOT trimmed — the tail
        # is the story on this host (docs/PERF.md "Latency frontier").
        from iip_uavsal_saliency_tpu.runners.latency import (
            latency_summary, measure_dispatch_latency,
        )

        step = lambda x, st: infer(params, batch_stats, x, gauss, ob, st)  # noqa: E731
        t0 = time.perf_counter()
        times = measure_dispatch_latency(
            step, x_u8, state, n=args.lat_dispatches)
        summ = latency_summary(times, frames_per_dispatch=v * s)
        log(f"first-call+samples took {time.perf_counter() - t0:.1f}s; "
            f"{summ['n']} dispatches of {v}x{s} frames at {h}x{w} "
            f"({'baked' if args.bake else 'args'}, {args.dtype})")
        log(f"p50 {summ['p50_ms']:.2f}  p90 {summ['p90_ms']:.2f}  "
            f"p95 {summ['p95_ms']:.2f}  p99 {summ['p99_ms']:.2f}  "
            f"max {summ['max_ms']:.2f} ms/dispatch; "
            f"sustained {summ['fps_sustained']:.1f} FPS")
        # reference latency point: 85 FPS => 11.76 ms/frame => ms for the
        # same number of frames; vs_baseline > 1 means we respond faster
        ref_ms = v * s * 1e3 / args.baseline_fps
        print(json.dumps({
            "metric": f"serving_latency_p99_ms_{h}x{w}_S{s}",
            "value": summ["p99_ms"],
            "unit": "ms/dispatch",
            "vs_baseline": round(ref_ms / summ["p99_ms"], 3),
            **{k: summ[k] for k in
               ("p50_ms", "p90_ms", "p95_ms", "max_ms", "mean_ms",
                "fps_sustained", "n")},
        }))
        return

    # compile + warmup (state buffers are donated -> always chain forward)
    t0 = time.perf_counter()
    out, st_cur = infer(params, batch_stats, x_u8, gauss, ob, state)
    jax.block_until_ready((out, st_cur))
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s; out {out.shape}")

    for _ in range(args.warmup):
        out, st_cur = infer(params, batch_stats, x_u8, gauss, ob, st_cur)
    float(out.astype(jnp.float32).sum())  # true sync before the timed loop

    if args.in_graph:
        # Chip-bound diagnostic: the whole step loop is one compiled program
        # (state chained through a lax.scan carry, same per-step math), so
        # host/relay dispatch is excluded. Two trip-wires learned the hard
        # way (docs/PERF.md "Measurement integrity"):
        # - each step indexes a DIFFERENT pre-staged clip from an HBM pool;
        #   with a loop-invariant input XLA hoists the state-independent
        #   trunk out of the scan and the number excludes most of the model;
        # - the sync is a host-side scalar fetch (float(...)), because
        #   block_until_ready returns early through the axon relay.
        # Reported per-step time still includes one relay round trip
        # (~25-40 ms) across the whole run — a slight UNDERstatement of
        # chip throughput at large --steps.
        from functools import partial

        if args.bake:
            from iip_uavsal_saliency_tpu.parallel.steps import make_baked_infer_step

            baked_plain = make_baked_infer_step(
                model, variables, gauss=gauss, ob=ob, compute_dtype=compute_dtype
            )
            infer_plain = lambda p, b, x, g, o, st: baked_plain(x, st)  # noqa: E731
        else:
            infer_plain = make_infer_step(model, compute_dtype=compute_dtype)
        n_pool = 4
        pool = jnp.asarray(
            rng.randint(0, 255, (n_pool, v, s, h, w, 3), np.uint8)
        )

        @partial(jax.jit, static_argnums=(6,), donate_argnums=(5,))
        def run_n(params, batch_stats, pool, gauss, ob, st, n):
            def step(st, i):
                x_i = jax.lax.dynamic_index_in_dim(
                    pool, i % n_pool, keepdims=False
                )
                out, st = infer_plain(params, batch_stats, x_i, gauss, ob, st)
                return st, out[:, -1, :, :, 0].astype(jnp.float32).sum()
            st, sums = jax.lax.scan(step, st, jnp.arange(n))
            return st, sums.sum()

        st_cur, chk = run_n(params, batch_stats, pool, gauss, ob, st_cur, args.steps)
        float(chk)  # compile + warm (true sync: scalar fetch)
        times = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            st_cur, chk = run_n(params, batch_stats, pool, gauss, ob, st_cur, args.steps)
            float(chk)
            times.append(time.perf_counter() - t0)
    else:
        times = []
        for _ in range(max(1, args.repeats)):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out, st_cur = infer(params, batch_stats, x_u8, gauss, ob, st_cur)
            # true sync: a scalar fetch of the last output (block_until_ready
            # returns early through the relay; per-step dispatches serialize
            # on the device queue, so the loop itself paces honestly)
            float(out.astype(jnp.float32).sum())
            times.append(time.perf_counter() - t0)

    # best-of-N: each repeat is a full true-sync streaming loop; transient
    # relay stalls only ever ADD time, so the minimum is the honest number
    dt = min(times)
    frames = args.steps * v * s
    fps = frames / dt
    log("repeat times: " + ", ".join(f"{t:.3f}s" for t in times))
    log(f"{frames} frames in {dt:.3f}s -> {fps:.1f} FPS ({dt / args.steps * 1e3:.2f} ms/step)")

    print(
        json.dumps(
            {
                "metric": f"inference_fps_{h}x{w}" + ("_chipbound" if args.in_graph else ""),
                "value": round(fps, 1),
                "unit": "frames/sec",
                "vs_baseline": round(fps / args.baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
