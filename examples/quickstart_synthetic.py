"""End-to-end quickstart on a generated synthetic dataset — no downloads.

This is the framework's equivalent of the reference's demo pipeline
(reference: Demo_Train_Test.py:283-303 — train -> test -> eval ->
visualize), runnable in a few minutes on CPU or TPU. It:

1. generates a tiny UAV2-layout video dataset (DIVX .avi clips +
   MATLAB fixMaps/fixPts ground truth) under --workdir;
2. trains UAVSal for --epochs epochs of TBPTT clip training
   (Trainer == the reference's train(), Demo_Train_Test.py:35-174);
3. runs resumable per-video inference to uint8 .mat saliency tensors
   (runners.infer == Demo_Test.py:60-97);
4. scores the held-out video with all 7 saliency metrics and writes
   MeanScores (evaluation.scorer == utils_score.py:493 +
   Tools/Vid_MeanScore.m);
5. renders a JET-heatmap overlay video (vis.overlay == utils_vis.py:103).

Real-dataset runs use the same calls with your UAV2/AVS1K root — see
docs/MIGRATION.md for the flag-by-flag mapping, or the `uavsal` CLI
(`uavsal train --data_dir ...`) for the command-line equivalent.

Usage:
    python examples/quickstart_synthetic.py [--workdir DIR] [--cpu]
    (--cpu forces JAX onto the host CPU; default uses whatever
    accelerator JAX finds)
"""

import argparse
import os


def build_dataset(root, n_videos=2, frames=8, h=48, w=72, seed=0):
    """Synthetic dataset in the reference's on-disk layout
    (utils_data.py:18-24 path conventions): Videos/<v>.avi,
    maps/<v>_fixMaps.mat, fixations/maps/<v>_fixPts.mat, txt/ splits."""
    import cv2
    import numpy as np

    from iip_uavsal_saliency_tpu.data.matio import savemat

    rng = np.random.RandomState(seed)
    for d in ("Videos", "maps", os.path.join("fixations", "maps"), "txt"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    names = [f"vid_{chr(97 + i)}" for i in range(n_videos)]
    for name in names:
        path = os.path.join(root, "Videos", name + ".avi")
        wr = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"DIVX"), 10, (w, h), isColor=True
        )
        for _ in range(frames):
            wr.write(rng.randint(0, 255, (h, w, 3), np.uint8))
        wr.release()

        fmap = np.zeros((h, w, 1, frames), np.uint8)
        floc = np.zeros((h, w, 1, frames), np.uint8)
        for t in range(frames):
            yy, xx = rng.randint(8, h - 8), rng.randint(8, w - 8)
            floc[yy, xx, 0, t] = 1
            blur = np.zeros((h, w), np.float32)
            blur[yy, xx] = 255
            blur = cv2.GaussianBlur(blur, (21, 21), 6)
            # normalize to peak 255: GaussianBlur preserves the SUM, so the
            # raw peak is ~1 and would truncate to a GT that vanishes when
            # letterboxed down to the 8x8 training maps (clips with empty GT
            # are skipped by the trainer — the demo would silently train on
            # fewer clips)
            fmap[:, :, 0, t] = (blur / blur.max() * 255).astype(np.uint8)
        savemat(os.path.join(root, "maps", name + "_fixMaps.mat"), {"fixMap": fmap})
        savemat(
            os.path.join(root, "fixations", "maps", name + "_fixPts.mat"),
            {"fixLoc": floc},
        )
    with open(os.path.join(root, "txt", "train.txt"), "w") as f:
        f.write("\n".join(names[:-1]) + "\n")
    with open(os.path.join(root, "txt", "val.txt"), "w") as f:
        f.write(names[-1] + "\n")
    return names


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default="./quickstart_out")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--cpu", action="store_true", help="force JAX onto CPU")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import numpy as np

    from iip_uavsal_saliency_tpu.data.matio import loadmat
    from iip_uavsal_saliency_tpu.evaluation.scorer import evalscores_vid, mean_scores
    from iip_uavsal_saliency_tpu.runners.infer import test_videos
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer
    from iip_uavsal_saliency_tpu.vis.overlay import visual_vid

    work = os.path.abspath(args.workdir)
    data_root = os.path.join(work, "UAV2")  # <workdir>/UAV2/{Videos,maps,...}
    res_dir = os.path.join(work, "Results")
    os.makedirs(data_root, exist_ok=True)

    print(f"[1/5] synthetic dataset -> {data_root}")
    names = build_dataset(data_root, n_videos=2, frames=8)

    # 64x64 letterboxed input -> 8x8 saliency, 2-frame clips: every model
    # stage runs, but a full CPU compile stays in the tens of seconds. Real
    # configs use iosize=(360, 640, 45, 80), time_dims=5, batch_size=10
    # (reference: Demo_Train_Test.py:253-259).
    iosize, time_dims = (64, 64, 8, 8), 2
    cfg = TrainConfig(
        method_name="QuickUAVSal",
        iosize=iosize,
        time_dims=time_dims,
        batch_size=1,
        epochs=args.epochs,
        bias_type=(1, 0, 1),  # observed-prior maps need a real dataset cache
        freeze=(),
        is_early_stop=False,
    )
    print("[2/5] training (TBPTT clip loop; first JAX compile dominates)...")
    trainer = Trainer(
        cfg, data_root, "UAV2", os.path.join(work, "weights"), ext=".avi",
        priors_cache_dir=os.path.join(work, "priors"),
    )
    state = trainer.train()
    print(f"      trained {int(state.step)} steps")

    print("[3/5] inference -> uint8 .mat saliency tensors")
    sal_dir = os.path.join(res_dir, "Saliency")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    test_videos(
        os.path.join(data_root, "Videos"), sal_dir, trainer.model, variables,
        iosize=iosize, batch_size=1, time_dims=time_dims, bias_type=(1, 0, 1),
        method_name="QuickUAVSal",
    )
    sal_path = os.path.join(sal_dir, "QuickUAVSal", names[-1] + ".mat")
    sal = loadmat(sal_path, "salmap")
    print(f"      {sal_path}: {sal.shape} {sal.dtype}")

    print("[4/5] 7-metric evaluation + mean scores")
    evalscores_vid(
        data_root, res_dir, "UAV2", ["QuickUAVSal"],
        batch_size=4, rng=np.random.RandomState(0),
    )
    means = mean_scores(res_dir, ["QuickUAVSal"])
    for metric, value in means["QuickUAVSal"].items():
        print(f"      {metric:>12s}: {value:.4f}")

    print("[5/5] heatmap overlay video")
    visual_vid(data_root, res_dir, "UAV2", ["QuickUAVSal"], with_color=1)
    print(
        "      overlay ->"
        f" {os.path.join(sal_dir, 'QuickUAVSal', 'Visual_color_map')}"
    )
    print(f"done. everything under {work}")


if __name__ == "__main__":
    main()
