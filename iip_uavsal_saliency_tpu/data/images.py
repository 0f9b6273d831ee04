"""SALICON-style static-image dataset for the SRF-Net pretraining stage.

TPU-native equivalent of the reference's torch `SALICON` Dataset +
`salicon_loader` (reference: dataset.py:27-115). Directory layout:

    <root>/<classes>/images/*.jpg|png        RGB stimuli
    <root>/<classes>/maps/*.png              blurred gaze maps (grayscale)
    <root>/<classes>/fixations/maps/*.mat    binary fixation points, key "I"

Per the reference transforms (dataset.py:90-106):
- images: plain (anisotropic) resize to (input_h, input_w), ImageNet
  normalize — NOT letterboxed;
- maps: plain resize to (target_h, target_w), scaled to [0, 1];
- fixation points: coordinate-remapped letterbox (`padding_fixation`) to
  (target_h, target_w) so no fixation is lost to interpolation.

Batches come out as plain numpy arrays shaped for the JAX models:
(B, H, W, 3) float32 images and (B, Ho, Wo, 2) targets with channel order
[fixMap, fixPts] (reference: Demo_Train_Test.py:114-115). Host-side decode
runs in a background thread so device steps overlap with I/O.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .letterbox import IMAGENET_MEAN, IMAGENET_STD, padding_fixation
from .matio import loadmat

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_IMG_EXT = (".jpg", ".jpeg", ".png")


def salicon_file_lists(
    root: str, classes: str = "train"
) -> Tuple[List[str], List[str], List[str]]:
    """Sorted (images, maps, fixations) path lists (reference: dataset.py:38-53)."""
    imgs_dir = os.path.join(root, classes, "images")
    imgs = sorted(
        os.path.join(imgs_dir, f)
        for f in os.listdir(imgs_dir)
        if f.lower().endswith(_IMG_EXT)
    )
    if classes == "test":
        return imgs, [], []
    maps_dir = os.path.join(root, classes, "maps")
    fixs_dir = os.path.join(root, classes, "fixations", "maps")
    maps = sorted(
        os.path.join(maps_dir, f)
        for f in os.listdir(maps_dir)
        if f.lower().endswith(_IMG_EXT)
    )
    fixs = sorted(
        os.path.join(fixs_dir, f) for f in os.listdir(fixs_dir) if f.endswith(".mat")
    )
    return imgs, maps, fixs


def load_salicon_example(
    img_path: str,
    map_path: Optional[str],
    fix_path: Optional[str],
    iosize: Sequence[int] = (480, 640, 60, 80),
    normalize: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """One (image, target) pair with the reference transforms."""
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) required for image decode")
    in_h, in_w, out_h, out_w = iosize

    img = cv2.imread(img_path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"unreadable image: {img_path}")
    img = img[:, :, ::-1]  # BGR -> RGB
    img = cv2.resize(img, (in_w, in_h), interpolation=cv2.INTER_LINEAR)
    img = img.astype(np.float32) / 255.0
    if normalize:
        img = (img - np.asarray(IMAGENET_MEAN, np.float32)) / np.asarray(
            IMAGENET_STD, np.float32
        )

    if map_path is None:
        return img, None

    gt_map = cv2.imread(map_path, cv2.IMREAD_GRAYSCALE)
    gt_map = cv2.resize(gt_map, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    gt_map = gt_map.astype(np.float32) / 255.0

    fix = np.asarray(loadmat(fix_path, "I"))
    gt_fix = padding_fixation(fix, out_h, out_w).astype(np.float32)

    true = np.stack([gt_map, gt_fix], axis=-1)  # (Ho, Wo, 2)
    return img, true


def salicon_batches(
    root: str,
    classes: str = "train",
    iosize: Sequence[int] = (480, 640, 60, 80),
    batch_size: int = 4,
    shuffle: Optional[bool] = None,
    drop_last: bool = False,
    rng: Optional[np.random.RandomState] = None,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Batched iterator over (images (B,H,W,3), targets (B,Ho,Wo,2)).

    shuffle defaults to classes == 'train' (reference: dataset.py:107-110).
    A background thread decodes the next `prefetch` batches while the device
    computes.
    """
    imgs, maps, fixs = salicon_file_lists(root, classes)
    if len(maps) != len(imgs) or len(fixs) != len(imgs):
        raise ValueError(
            f"mismatched SALICON lists: {len(imgs)} images, "
            f"{len(maps)} maps, {len(fixs)} fixations"
        )
    order = np.arange(len(imgs))
    if shuffle is None:
        shuffle = classes == "train"
    if shuffle:
        (rng or np.random).shuffle(order)

    def make_batch(idx):
        xs, ys = [], []
        for i in idx:
            x, y = load_salicon_example(imgs[i], maps[i], fixs[i], iosize)
            xs.append(x)
            ys.append(y)
        return np.stack(xs), np.stack(ys)

    starts = range(0, len(order), batch_size)
    batches = [
        order[s : s + batch_size]
        for s in starts
        if not (drop_last and s + batch_size > len(order))
    ]

    from .loaders import _prefetched

    yield from _prefetched(batches, make_batch, prefetch)
