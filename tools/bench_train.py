"""A/B the jitted TBPTT train step: donated vs non-donated TrainState,
f32 vs mixed precision, at the flagship clip shape.

Backs the measured decision to keep `TrainConfig.donate=False` by default
(donation was SLOWER on TPU v5e — docs/PERF.md "Training throughput"); run
on the real TPU chip and paste the numbers into that section.

Methodology follows docs/PERF.md "Measurement integrity": every timed
region ends in a host scalar fetch (the loss), never `block_until_ready`
(which returns early through the axon relay). Peak HBM comes from
`device.memory_stats()` where the backend exposes it.

Usage:
    python tools/bench_train.py [--steps 20] [--time-dims 5] [--clips 6]
"""

import argparse
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def peak_bytes(dev):
    try:
        stats = dev.memory_stats()
        return stats.get("peak_bytes_in_use")
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--clips", type=int, default=6,
                    help="frames/step = clips * time_dims (default 30, the "
                         "S=30 point of the PERF.md true-sync slope)")
    ap.add_argument("--time-dims", type=int, default=5)
    ap.add_argument("--videos", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(repo)
    import jax
    import jax.numpy as jnp
    import optax

    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
    from iip_uavsal_saliency_tpu.parallel.steps import (
        create_train_state, make_train_step,
    )
    from iip_uavsal_saliency_tpu.training.losses import loss_fu

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    h, w = args.height, args.width
    ho, wo = h // 8, w // 8
    s, v = args.clips * args.time_dims, args.videos

    model = UAVSal(time_dims=args.time_dims)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (v, s, h, w, 3), np.uint8))
    gauss = jnp.asarray(rng.rand(ho, wo, 8).astype(np.float32))
    ob = jnp.asarray(rng.rand(ho, wo, 20).astype(np.float32))
    y = jnp.asarray(rng.rand(v, s, ho, wo, 2).astype(np.float32))
    state0 = model.init_state(h, w, v)
    x_f = x[:, :args.time_dims].astype(jnp.float32) / 255.0
    variables = init_variables(model, jax.random.PRNGKey(0), x_f, gauss, ob, state0)
    # host snapshot: donated runs delete their device buffers, so each config
    # materializes a FRESH device copy (sharing leaves would poison the next run)
    host_vars = jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)),
                                       dict(variables))
    tx = optax.adam(1e-4)

    results = {}
    # interleaved A/B inside each precision: the two arms' timed repeats
    # alternate, so slow relay drift hits both equally
    for mp in (False, True):
        arms = {}
        for donate in (False, True):
            label = f"{'bf16' if mp else 'f32 '} donate={donate}"
            ts = create_train_state(
                jax.tree_util.tree_map(jnp.asarray, host_vars), tx)
            step = make_train_step(
                model, tx, loss_fn=loss_fu, donate=donate,
                compute_dtype=jnp.bfloat16 if mp else None,
            )
            rnn = model.init_state(h, w, v)
            t0 = time.perf_counter()
            ts, loss, rnn = step(ts, x, gauss, ob, rnn, y)
            float(loss)
            log(f"{label}: first call {time.perf_counter() - t0:.1f}s")
            for _ in range(args.warmup):
                ts, loss, rnn = step(ts, x, gauss, ob, rnn, y)
            float(loss)
            arms[label] = {"step": step, "ts": ts, "rnn": rnn, "times": []}
        for _ in range(args.repeats):
            for label, arm in arms.items():
                step, ts, rnn = arm["step"], arm["ts"], arm["rnn"]
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    ts, loss, rnn = step(ts, x, gauss, ob, rnn, y)
                float(loss)  # host scalar fetch = the only trustworthy sync
                arm["times"].append(time.perf_counter() - t0)
                arm["ts"], arm["rnn"] = ts, rnn
        for label, arm in arms.items():
            dt = min(arm["times"])
            fps = args.steps * v * s / dt
            results[label] = (fps, dt / args.steps * 1e3)
            log(f"{label}: {fps:.1f} frames/s ({dt / args.steps * 1e3:.2f} ms/step)  "
                + "times: " + ", ".join(f"{t:.2f}s" for t in arm["times"]))
        del arms

    log("")
    log(f"shape: V={v} S={s} {h}x{w}")
    for label, (fps, ms) in results.items():
        log(f"  {label}: {fps:7.1f} frames/s  {ms:7.2f} ms/step")
    # NO per-arm peak-HBM column ON PURPOSE: peak_bytes_in_use is a
    # process-wide monotonic high-water mark, and the interleaved A/B keeps
    # BOTH arms' TrainStates live simultaneously — any per-arm reading
    # would report the same polluted maximum. To measure one config's peak
    # (e.g. the donate=True HBM saving), run this tool twice in fresh
    # processes with a single arm's settings and compare the figure below.
    pk = peak_bytes(dev)
    if pk:
        log(f"  process-wide peak HBM (all arms together): {pk / 2**20:.0f} MiB")


if __name__ == "__main__":
    main()
