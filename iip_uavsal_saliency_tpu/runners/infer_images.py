"""Resumable static-image saliency inference (SALICON-style datasets).

Produces the `Saliency/<method>/*.png` layout consumed by the image eval
drivers (evaluation/scorer.evalscores_img*, reference: utils_score.py:601-607
reads `Saliency/<m>/<name>.png`). Predictions are resized back to each
image's native resolution and max-normalized to uint8, mirroring the video
postprocess semantics (reference: utils_data.py:289-303).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.images import salicon_file_lists
from ..data.letterbox import im2uint8
from ..utils.logging import get_logger

log = get_logger("infer_img")


def test_images(
    data_root: str,
    output_path: str,
    model,
    variables,
    classes: str = "val",
    iosize: Tuple[int, int, int, int] = (480, 640, 60, 80),
    batch_size: int = 8,
    method_name: Optional[str] = None,
) -> None:
    """Predict saliency PNGs for every image under <data_root>/<classes>/images."""
    import cv2

    if method_name:
        output_path = os.path.join(output_path, method_name)
    os.makedirs(output_path, exist_ok=True)

    imgs, _, _ = salicon_file_lists(data_root, classes)

    @jax.jit
    def step(x):
        return model.apply(variables, x)

    batch, names, sizes = [], [], []

    def flush():
        if not batch:
            return
        x = jnp.asarray(np.stack(batch))
        pred = np.asarray(step(x))[..., 0]
        for p, name, (h, w) in zip(pred, names, sizes):
            sal = cv2.resize(p, (w, h), interpolation=cv2.INTER_LINEAR)
            # max-normalize to 0..255 (reference: utils_data.py:303 returns
            # img/max*255); the head is a sigmoid, so without this im2uint8
            # would round the whole (0,1) map to {0,1}
            sal = sal / (np.max(sal) + 2.2204e-16) * 255.0
            cv2.imwrite(os.path.join(output_path, name + ".png"), im2uint8(sal))
        batch.clear()
        names.clear()
        sizes.clear()

    from ..data.letterbox import normalize_frames

    in_h, in_w = iosize[0], iosize[1]

    done = 0
    for img_path in imgs:
        name = os.path.splitext(os.path.basename(img_path))[0]
        out_file = os.path.join(output_path, name + ".png")
        if os.path.exists(out_file):  # resumable
            continue
        raw = cv2.imread(img_path, cv2.IMREAD_COLOR)  # single decode
        if raw is None:
            raise IOError(f"unreadable image: {img_path}")
        x = normalize_frames(
            cv2.resize(raw[:, :, ::-1], (in_w, in_h), interpolation=cv2.INTER_LINEAR)
        )
        batch.append(x)
        names.append(name)
        sizes.append(raw.shape[:2])
        done += 1
        if len(batch) == batch_size:
            flush()
    flush()
    log.info("%s: %d images predicted -> %s", classes, done, output_path)
