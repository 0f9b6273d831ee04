"""Low-latency streaming serving: saliency on a live frame stream.

The file-based runner (`runners.infer.test_videos`, the reference's
Demo_Test.py flow) processes videos on disk. This example shows the other
production pattern: a LIVE source (camera / RTSP / frame queue) served
clip-by-clip with the recurrent state chained across dispatches — the
exact loop bench.py measures (docs/PERF.md: ~1541 FPS at 360x640 bf16 on
one TPU v5e chip with baked-constant serving, 5.45 ms/clip in the S=5
latency mode).

Key moves (see docs/PERF.md "What was optimized"):
- frames ship to the device as uint8; normalization fuses on-chip;
- `make_baked_infer_step`: weights/priors embedded as compile-time
  CONSTANTS (they never change in serving) — XLA folds the eval-BN
  affines and the constant-prior convs; +11.7% measured, and the step
  takes just (clip, state);
- `donate_state=True`: the carried state buffer is reused in place;
- bf16 serving (`compute_dtype`) auto-selects the fused Pallas TWA
  kernel on TPU;
- the stateful API mirrors the reference: state starts at zeros per
  stream and is reset on scene/stream change.

Usage:
    python examples/streaming_serving.py [--cpu] [--clips 8]
    (synthetic 360x640 frames; swap `synthetic_stream` for your capture
    loop — each step consumes time_dims frames per video stream)
"""

import argparse
import os
import time


def synthetic_stream(n_clips, time_dims, h, w, seed=0):
    """Stand-in for a capture source: yields (S, H, W, 3) uint8 clips."""
    import numpy as np

    rng = np.random.RandomState(seed)
    for _ in range(n_clips):
        yield rng.randint(0, 255, (time_dims, h, w, 3), np.uint8)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cpu", action="store_true", help="force JAX onto CPU")
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--height", type=int, default=None,
                    help="input height (default 360; 64 under --cpu)")
    ap.add_argument("--width", type=int, default=None,
                    help="input width (default 640; 64 under --cpu)")
    ap.add_argument("--time-dims", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    # keep the CPU demo snappy, but honor explicitly passed sizes
    if args.height is None:
        args.height = 64 if args.cpu else 360
    if args.width is None:
        args.width = 64 if args.cpu else 640

    import jax
    import jax.numpy as jnp
    import numpy as np

    from iip_uavsal_saliency_tpu.data.priors import get_gauss_priors
    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
    from iip_uavsal_saliency_tpu.parallel.steps import make_baked_infer_step

    h, w, t = args.height, args.width, args.time_dims
    ho, wo = h // 8, w // 8
    on_tpu = jax.devices()[0].platform == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else None

    # random weights for the demo; production loads a checkpoint via
    # runners.infer.load_model_for_inference (see docs/MIGRATION.md)
    model = UAVSal(time_dims=t, bias_type=(1, 0, 1))
    gauss = jnp.asarray(get_gauss_priors(ho, wo, 8))
    state = model.init_state(h, w, 1)
    x0 = jnp.zeros((1, t, h, w, 3), jnp.float32)
    variables = init_variables(model, jax.random.PRNGKey(0), x0, gauss, None, state)
    if compute_dtype is not None:
        state = state.astype(compute_dtype)

    # weights + priors baked in as constants: step(clip, state) only
    infer = make_baked_infer_step(
        model, variables, gauss=gauss, compute_dtype=compute_dtype,
        donate_state=True,
    )

    print(f"serving {args.clips} clips of {t} frames at {h}x{w} "
          f"({'bf16 TPU' if on_tpu else 'CPU demo'})...")
    for i, clip in enumerate(synthetic_stream(args.clips, t, h, w)):
        t0 = time.perf_counter()
        sal, state = infer(jnp.asarray(clip)[None], state)
        # consume the result (here: fetch the last frame's peak location);
        # fetching forces completion, which is the honest latency point
        last = np.asarray(sal[0, -1, :, :, 0], np.float32)
        py, px = np.unravel_index(last.argmax(), last.shape)
        ms = (time.perf_counter() - t0) * 1e3
        warm = " (compile)" if i == 0 else ""
        print(f"  clip {i}: peak saliency at ({py},{px}), "
              f"{ms:7.1f} ms{warm}")
    print("stream done; reset state to zeros for the next stream:")
    print("  state = model.init_state(h, w, 1)")


if __name__ == "__main__":
    main()
