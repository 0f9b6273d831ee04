"""End-to-end eval-driver throughput on a synthetic workload.

Times `evalscores_vid` (the production 7-metric driver) over N synthetic
videos at GT resolution — including the `.mat` decode, GT resize, negative
sampling, device scoring, and score write-back — and prints frames/sec.
This is the workload the round-4 pipelining targeted (video prefetch thread
+ depth-2 device/host double buffering); compare against docs/PERF.md
"Evaluation throughput".

    python tools/bench_eval.py [--videos 4] [--frames 32] [--height 720]
        [--width 1280] [--keys all|det]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--keys", choices=["all", "det"], default="all",
                    help="all 7 metrics, or only the deterministic 4")
    ap.add_argument("--repeats", type=int, default=3,
                    help="warm repeats; BEST is reported (relay stalls only "
                         "ever add time — bench.py methodology)")
    args = ap.parse_args()

    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from iip_uavsal_saliency_tpu.data.matio import savemat
    from iip_uavsal_saliency_tpu.evaluation.scorer import KEYS_ORDER, evalscores_vid

    h, w, t = args.height, args.width, args.frames
    keys = KEYS_ORDER if args.keys == "all" else ["NSS", "KLD", "SIM", "CC"]
    rng = np.random.RandomState(0)

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "DS")
        res = os.path.join(tmp, "Results")
        os.makedirs(os.path.join(root, "maps"))
        os.makedirs(os.path.join(root, "fixations", "maps"))
        sal_dir = os.path.join(res, "Saliency", "M")
        os.makedirs(sal_dir)
        for v in range(args.videos):
            name = f"vid_{v:02d}"
            sal = rng.randint(0, 255, (h, w, 1, t), dtype=np.uint8)
            fmap = rng.randint(0, 255, (h, w, 1, t), dtype=np.uint8)
            floc = (rng.rand(h, w, 1, t) < 2e-4).astype(np.uint8)
            savemat(os.path.join(sal_dir, name + ".mat"), {"salmap": sal})
            savemat(os.path.join(root, "maps", name + "_fixMaps.mat"),
                    {"fixMap": fmap})
            savemat(os.path.join(root, "fixations", "maps", name + "_fixPts.mat"),
                    {"fixLoc": floc})
        # prebuild the sAUC fixation pool outside the timed region (it is a
        # one-time dataset cache in production, resume-skipped afterwards)
        if "AUC_shuffled" in keys:
            from iip_uavsal_saliency_tpu.evaluation import scorer as _s

            cache = os.path.join(root, "ALLFixPts_DS.npy")
            pool = _s.collect_all_fixations(
                os.path.join(root, "fixations", "maps"), "DS")
            np.save(cache, np.array(pool, dtype=object), allow_pickle=True)

        # warm the jitted metric programs once (a single small batch)
        t0 = time.time()
        evalscores_vid(root, res, "DS", ["M"], keys_order=keys,
                       batch_size=args.batch_size, rng=np.random.RandomState(0))
        dt = time.time() - t0
        frames = args.videos * t
        print(f"{frames} frames x {len(keys)} metrics at {h}x{w}: "
              f"{dt:.1f}s -> {frames / dt:.1f} frames/sec (incl. compile on "
              f"first run; re-run for warm numbers)", file=sys.stderr)
        # warm repeats on a fresh score dir each time; BEST reported
        import shutil

        best = float("inf")
        for _ in range(max(1, args.repeats)):
            shutil.rmtree(os.path.join(res, "Scores"))
            t0 = time.time()
            evalscores_vid(root, res, "DS", ["M"], keys_order=keys,
                           batch_size=args.batch_size,
                           rng=np.random.RandomState(0))
            best = min(best, time.time() - t0)
        print(f"warm best: {frames} frames in {best:.1f}s -> "
              f"{frames / best:.1f} frames/sec")


if __name__ == "__main__":
    main()
