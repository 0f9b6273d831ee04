"""Measure the default serving path's metric-level deltas ON TPU.

Same comparison as tests/test_pipeline.py::test_bf16_serving_metric_parity,
but on the real backend AND at the flagship iosize (360x640 -> 45x80), so
the bf16 leg exercises the actual fused Pallas TWA kernel (the CPU test
runs tiny shapes + the XLA scan). Prints a markdown table for
docs/PARITY.md.

A 1-epoch training on the synthetic set precedes the comparison: an
untrained model emits near-uniform maps whose NSS/CC are standardization
noise (a first cut with random-init weights + randomized BN stats measured
NSS deltas of 0.19 — meaningless, both legs were scoring noise). Trained
stats + structured maps make the deltas interpretable.

    python tools/bf16_parity_tpu.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IOSIZE = (360, 640, 45, 80)
TIME_DIMS = 5
NATIVE_H, NATIVE_W, NFRAMES = 360, 640, 10


def build_dataset(root):
    import cv2

    from iip_uavsal_saliency_tpu.data.matio import savemat

    rng = np.random.RandomState(0)
    for d in ("Videos", "maps", os.path.join("fixations", "maps"), "txt"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    names = ["vid_a", "vid_b"]
    for name in names:
        wr = cv2.VideoWriter(
            os.path.join(root, "Videos", name + ".avi"),
            cv2.VideoWriter_fourcc(*"DIVX"), 10, (NATIVE_W, NATIVE_H), isColor=True,
        )
        # moving bright blob on textured noise: gives training a learnable,
        # localized target so the trained maps are structured
        for t in range(NFRAMES):
            frame = rng.randint(0, 80, (NATIVE_H, NATIVE_W, 3), np.uint8)
            cy, cx = 80 + 20 * t, 120 + 35 * t
            cv2.circle(frame, (cx, cy), 40, (255, 255, 255), -1)
            wr.write(frame)
        wr.release()
        fmap = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        floc = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        for t in range(NFRAMES):
            cy, cx = 80 + 20 * t, 120 + 35 * t
            floc[cy, cx, 0, t] = 1
            blur = np.zeros((NATIVE_H, NATIVE_W), np.float32)
            blur[cy, cx] = 255
            fmap[:, :, 0, t] = np.clip(
                cv2.GaussianBlur(blur, (81, 81), 18) * 40, 0, 255
            ).astype(np.uint8)
        savemat(os.path.join(root, "maps", name + "_fixMaps.mat"), {"fixMap": fmap})
        savemat(os.path.join(root, "fixations", "maps", name + "_fixPts.mat"),
                {"fixLoc": floc})
    with open(os.path.join(root, "txt", "train.txt"), "w") as f:
        f.write("vid_a\n")
    with open(os.path.join(root, "txt", "val.txt"), "w") as f:
        f.write("vid_b\n")


def main():
    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.evaluation.scorer import evalscores_vid, mean_scores
    from iip_uavsal_saliency_tpu.ops.fold import fold_batchnorm
    from iip_uavsal_saliency_tpu.runners.infer import test_videos
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "UAV2")
        build_dataset(root)
        res_dir = os.path.join(tmp, "Results")
        out_path = os.path.join(res_dir, "Saliency")

        cfg = TrainConfig(
            method_name="ParityUAVSal", iosize=IOSIZE, time_dims=TIME_DIMS,
            batch_size=1, epochs=1, bias_type=(1, 0, 1), freeze=(),
            is_early_stop=False,
        )
        trainer = Trainer(cfg, root, "UAV2", os.path.join(tmp, "w"), ext=".avi",
                          priors_cache_dir=os.path.join(tmp, "priors"))
        state = trainer.train()
        variables = {"params": state.params, "batch_stats": state.batch_stats}

        common = dict(iosize=IOSIZE, batch_size=2, time_dims=TIME_DIMS,
                      bias_type=(1, 0, 1), priors_cache_dir=os.path.join(tmp, "priors"))
        test_videos(root + "/Videos", out_path, trainer.model, variables,
                    method_name="F32", **common)
        test_videos(root + "/Videos", out_path, trainer.model,
                    fold_batchnorm(variables),
                    method_name="BF16", compute_dtype=jnp.bfloat16, **common)

        keys = ["NSS", "KLD", "SIM", "CC"]
        evalscores_vid(root, res_dir, "UAV2", ["F32", "BF16"],
                       keys_order=keys, batch_size=8,
                       rng=np.random.RandomState(0))
        means = mean_scores(res_dir, ["F32", "BF16"], keys_order=keys, save=False)

        floors = {"CC": 0.01, "SIM": 0.01, "NSS": 0.05, "KLD": 0.05}
        print("| Metric | f32 | bf16+fold | abs Δ | tolerance |")
        print("|---|---|---|---|---|")
        ok = True
        for k in keys:
            a, b = means["F32"][k], means["BF16"][k]
            tol = max(0.01 * abs(a), floors[k])
            flag = "ok" if abs(a - b) <= tol else "FAIL"
            ok &= abs(a - b) <= tol
            print(f"| {k} | {a:.4f} | {b:.4f} | {abs(a - b):.4f} | {tol:.4f} ({flag}) |")
        print("PASS" if ok else "FAIL")
        return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
