"""A/B the image-eval device path against the per-image host path.

The image driver (`evalscores_img_sum`) batches same-shaped images through
the fused device metrics (32 images -> ~6 dispatches) when the device is
LOCAL, and falls back to per-image host metrics when dispatch latency says
remote relay (`scorer._resolve_img_device_auc`). The relay host could
never show the device path winning (docs/PERF.md round-4 "honest
caveat"); this tool runs the REAL driver code path on a local device —
`JAX_PLATFORMS=cpu python tools/bench_eval_img.py` simulates the
direct-attached low-RTT condition the batched path was built for — and
times `device_auc=True` vs `device_auc=False` on a synthetic
SALICON-shaped workload (480x640, all 7 metrics).

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/bench_eval_img.py
        [--images 64] [--repeats 3]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--keys", choices=["all", "det"], default="all")
    args = ap.parse_args()

    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import cv2

    from iip_uavsal_saliency_tpu.data.matio import savemat
    from iip_uavsal_saliency_tpu.evaluation.scorer import (
        KEYS_ORDER, device_dispatch_ms, evalscores_img_sum,
    )

    h, w = args.height, args.width
    keys = KEYS_ORDER if args.keys == "all" else ["NSS", "KLD", "SIM", "CC"]
    rng = np.random.RandomState(0)
    print(f"device dispatch RTT: {device_dispatch_ms():.2f} ms "
          f"(auto-select threshold 2.0)", file=sys.stderr)

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "DS")
        res = os.path.join(tmp, "Results")
        os.makedirs(os.path.join(root, "maps"))
        os.makedirs(os.path.join(root, "fixations", "maps"))
        sal_dir = os.path.join(res, "Saliency", "M")
        os.makedirs(sal_dir)
        for i in range(args.images):
            name = f"img_{i:04d}"
            cv2.imwrite(os.path.join(sal_dir, name + ".png"),
                        rng.randint(0, 255, (h, w), np.uint8))
            cv2.imwrite(os.path.join(root, "maps", name + ".png"),
                        rng.randint(0, 255, (h, w), np.uint8))
            savemat(os.path.join(root, "fixations", "maps", name + ".mat"),
                    {"I": (rng.rand(h, w) < 2e-4).astype(np.uint8)})

        results = {}
        for device_auc in (True, False):
            label = "device-batched" if device_auc else "per-image host"
            # first run includes compile; warm repeats, best-of reported
            times = []
            for rep in range(args.repeats + 1):
                score_dir = os.path.join(res, "Scores_sum")
                if os.path.isdir(score_dir):
                    shutil.rmtree(score_dir)
                t0 = time.perf_counter()
                evalscores_img_sum(root, res, "DS", ["M"], keys_order=keys,
                                   rng=np.random.RandomState(0),
                                   device_auc=device_auc)
                dt = time.perf_counter() - t0
                if rep:  # rep 0 = compile
                    times.append(dt)
                else:
                    print(f"{label}: first (incl. compile) {dt:.1f}s",
                          file=sys.stderr)
            best = min(times)
            results[label] = best
            print(f"{label}: best of {len(times)} warm: {best:.1f}s -> "
                  f"{args.images / best:.1f} images/sec", file=sys.stderr)

        dev, host = results["device-batched"], results["per-image host"]
        print(f"speedup device vs host: {host / dev:.2f}x "
              f"({args.images} images, {len(keys)} metrics, {h}x{w})")


if __name__ == "__main__":
    main()
