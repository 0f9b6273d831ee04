"""Resumable per-video saliency inference.

TPU-native equivalent of the reference's test() driver
(reference: Demo_Test.py:30-95):

- loop sorted *.avi/*.mp4 in the input dir, skip when the output .mat exists
  (video-level resumability);
- decode + letterbox all frames, truncate to a multiple of time_dims;
- clip loop with carried recurrent state (reset per video);
- un-letterbox each prediction to native resolution, max-normalize to uint8;
- write `{'salmap': (H, W, 1, T) uint8}` MATLAB v7.3 files.

TPU pipeline details:
- frames go to the device as uint8 (normalize fused on-chip,
  parallel/steps.make_infer_step);
- the next clip is shipped (`jax.device_put`) while the current one computes
  — JAX's async dispatch gives the double-buffering;
- ragged final clips are right-padded (extra frames sliced off on the host),
  so a single compiled program serves the whole run.
"""

from __future__ import annotations

import math
import os
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.letterbox import im2uint8, postprocess_prediction
from ..data.matio import savemat
from ..data.priors import get_gauss_priors, get_ob_priors
from ..data.video import preprocess_videos
from ..models import UAVSal
from ..parallel.steps import make_infer_step
from ..training.checkpoint import load_checkpoint
from ..utils.logging import get_logger

log = get_logger("infer")

VIDEO_EXTS = (".avi", ".AVI", ".mp4")


def load_model_for_inference(
    model_path: str,
    cnn_type: str = "mobilenet_v2",
    time_dims: int = 5,
    num_stblock: int = 2,
    bias_type: Sequence[int] = (1, 1, 1),
):
    """Build UAVSal + restore a checkpoint written by the Trainer (or by the
    torch converter in models/convert.py)."""
    model = UAVSal(
        cnn_type=cnn_type, time_dims=time_dims, num_stblock=num_stblock, bias_type=bias_type
    )
    ckpt = load_checkpoint(model_path)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    return model, variables


def test_videos(
    input_path: str,
    output_path: str,
    model,
    variables,
    iosize: Tuple[int, int, int, int] = (360, 640, 45, 80),
    batch_size: int = 4,
    time_dims: int = 5,
    bias_type: Sequence[int] = (1, 1, 1),
    save_frames: float = float("inf"),
    train_data_dir: str = "",
    dataset: str = "",
    priors_cache_dir: str = "",
    method_name: Optional[str] = None,
) -> None:
    """Run saliency prediction over every video in `input_path`."""
    if method_name:
        output_path = os.path.join(output_path, method_name)
    os.makedirs(output_path, exist_ok=True)

    shape_r, shape_c, shape_r_out, shape_c_out = iosize
    gauss = (
        jnp.asarray(get_gauss_priors(shape_r_out, shape_c_out, 8, priors_cache_dir))
        if bias_type[0]
        else None
    )
    ob = (
        jnp.asarray(
            get_ob_priors(train_data_dir, dataset, "train", shape_r_out, shape_c_out, 20,
                          priors_cache_dir)
        )
        if bias_type[1]
        else None
    )

    infer_step = make_infer_step(model)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    file_names = sorted(f for f in os.listdir(input_path) if f.endswith(VIDEO_EXTS))
    s = batch_size * time_dims

    for idx, name in enumerate(file_names):
        out_file = os.path.join(output_path, os.path.splitext(name)[0] + ".mat")
        if os.path.exists(out_file):  # resumable (reference: Demo_Test.py:60-62)
            continue
        log.info("%d/%d %s", idx + 1, len(file_names), name)
        t0 = time.time()

        vidimgs, nframes, height, width = preprocess_videos(
            os.path.join(input_path, name), shape_r, shape_c, save_frames,
            mode="RGB", normalize=False,
        )
        count_bs = nframes // time_dims
        total = count_bs * time_dims
        vidimgs = vidimgs[:total]

        state = model.init_state(shape_r, shape_c, 1)
        sal = np.zeros((total, shape_r_out, shape_c_out), np.float32)
        for start in range(0, total, s):
            clip = vidimgs[start : start + s]
            n_valid = clip.shape[0]
            if n_valid < s:
                clip = np.concatenate([clip, np.repeat(clip[-1:], s - n_valid, 0)], 0)
            out, state = infer_step(
                params, batch_stats, jnp.asarray(clip)[None], gauss, ob, state
            )
            sal[start : start + n_valid] = np.asarray(out)[0, :n_valid, :, :, 0]

        pred_mat = np.zeros((height, width, 1, total), np.uint8)
        for t in range(total):
            pred_mat[:, :, 0, t] = im2uint8(postprocess_prediction(sal[t], height, width))

        keep = int(min(total, save_frames))
        savemat(out_file, {"salmap": pred_mat[:, :, :, :keep]})
        fps = total / max(time.time() - t0, 1e-9)
        log.info("  %d frames in %.2fs (%.1f FPS end-to-end)", total, time.time() - t0, fps)
