"""Measure the default serving path's metric-level deltas ON TPU.

Same comparison as tests/test_pipeline.py::test_bf16_serving_metric_parity,
but on the real backend so the bf16 leg exercises the actual fused Pallas
TWA kernel (the CPU test falls back to the XLA scan). Prints a markdown
table for docs/PARITY.md.

Synthetic 2-video set (no dataset needed), random-init model with
randomized BN statistics (so the BN fold is numerically non-trivial).

    python tools/bf16_parity_tpu.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IOSIZE = (64, 64, 8, 8)
TIME_DIMS = 2
NATIVE_H, NATIVE_W, NFRAMES = 48, 72, 8


def build_dataset(root):
    import cv2

    from iip_uavsal_saliency_tpu.data.matio import savemat

    rng = np.random.RandomState(0)
    for d in ("Videos", "maps", os.path.join("fixations", "maps")):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    for name in ("vid_a", "vid_b"):
        wr = cv2.VideoWriter(
            os.path.join(root, "Videos", name + ".avi"),
            cv2.VideoWriter_fourcc(*"DIVX"), 10, (NATIVE_W, NATIVE_H), isColor=True,
        )
        for _ in range(NFRAMES):
            wr.write(rng.randint(0, 255, (NATIVE_H, NATIVE_W, 3), np.uint8))
        wr.release()
        fmap = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        floc = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        for t in range(NFRAMES):
            yy, xx = rng.randint(8, NATIVE_H - 8), rng.randint(8, NATIVE_W - 8)
            floc[yy, xx, 0, t] = 1
            blur = np.zeros((NATIVE_H, NATIVE_W), np.float32)
            blur[yy, xx] = 255
            fmap[:, :, 0, t] = cv2.GaussianBlur(blur, (21, 21), 6).astype(np.uint8)
        savemat(os.path.join(root, "maps", name + "_fixMaps.mat"), {"fixMap": fmap})
        savemat(os.path.join(root, "fixations", "maps", name + "_fixPts.mat"),
                {"fixLoc": floc})


def rand_stats(variables, seed=3):
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)

    def walk(p):
        if isinstance(p, dict):
            if set(p) == {"mean", "var"}:
                return {
                    "mean": jnp.asarray(rng.randn(*np.shape(p["mean"])) * 0.5,
                                        jnp.float32),
                    "var": jnp.asarray(0.25 + rng.rand(*np.shape(p["var"])),
                                       jnp.float32),
                }
            return {k: walk(v) for k, v in p.items()}
        return p

    out = dict(variables)
    out["batch_stats"] = walk(variables["batch_stats"])
    return out


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    import jax.numpy as jnp

    from iip_uavsal_saliency_tpu.evaluation.scorer import evalscores_vid, mean_scores
    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
    from iip_uavsal_saliency_tpu.ops.fold import fold_batchnorm
    from iip_uavsal_saliency_tpu.runners.infer import test_videos

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "UAV2")
        build_dataset(root)
        res_dir = os.path.join(tmp, "Results")
        out_path = os.path.join(res_dir, "Saliency")

        h, w = IOSIZE[0], IOSIZE[1]
        model = UAVSal(time_dims=TIME_DIMS, bias_type=(1, 0, 1))
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, TIME_DIMS, h, w, 3).astype(np.float32))
        g = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
        st = model.init_state(h, w, 1)
        variables = rand_stats(
            init_variables(model, jax.random.PRNGKey(0), x, g, None, st)
        )

        common = dict(iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
                      bias_type=(1, 0, 1))
        test_videos(root + "/Videos", out_path, model, variables,
                    method_name="F32", **common)
        test_videos(root + "/Videos", out_path, model, fold_batchnorm(variables),
                    method_name="BF16", compute_dtype=jnp.bfloat16, **common)

        keys = ["NSS", "KLD", "SIM", "CC"]
        evalscores_vid(root, res_dir, "UAV2", ["F32", "BF16"],
                       keys_order=keys, batch_size=4,
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
