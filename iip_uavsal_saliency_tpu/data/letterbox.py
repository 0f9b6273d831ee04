"""Letterbox padding, fixation-point remapping, normalization, postprocess.

Host-side preprocessing with exact semantic parity to the reference
(reference: utils_data.py:321-385 padding/fixation, :43-65 normalize,
:289-319 postprocess, :9-40 resize helpers). These run on CPU as part of the
input pipeline; the uint8->float normalize also has a device-side variant
(`normalize_frames` works on jnp arrays too) so frames can ship to HBM as
uint8 (4x less PCIe/DMA traffic) and normalize on-chip.
"""

from __future__ import annotations

import numpy as np

EPS = 2.2204e-16
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in the target image
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) is required for this operation")


def resize_img(img: np.ndarray, maxvalue: int = 640, minvalue: int = 320) -> np.ndarray:
    """Scale so max side >= maxvalue or min side >= minvalue (reference: utils_data.py:9-18)."""
    _require_cv2()
    o_rows, o_cols = img.shape[:2]
    rate = max(maxvalue / max(o_rows, o_cols), minvalue / min(o_rows, o_cols))
    return cv2.resize(img, (int(o_cols * rate), int(o_rows * rate)))


def resize_pts(img: np.ndarray, maxvalue: int = 640, minvalue: int = 320) -> np.ndarray:
    """Coordinate-remap resize of a binary point map (reference: utils_data.py:20-40)."""
    o_rows, o_cols = img.shape[:2]
    rate = max(maxvalue / max(o_rows, o_cols), minvalue / min(o_rows, o_cols))
    n_rows, n_cols = int(o_rows * rate), int(o_cols * rate)
    out = np.zeros((n_rows, n_cols), np.uint8)
    coords = np.argwhere(img)
    if coords.size:
        r = np.minimum(np.round(coords[:, 0] * rate).astype(int), n_rows - 1)
        c = np.minimum(np.round(coords[:, 1] * rate).astype(int), n_cols - 1)
        out[r, c] = 1
    return out


def padding(img: np.ndarray, shape_r: int = 480, shape_c: int = 640, channels: int = 3) -> np.ndarray:
    """Aspect-preserving resize + center zero-pad (reference: utils_data.py:321-343).

    Deliberate divergence: the output buffer preserves the INPUT dtype. The
    reference hard-codes uint8 (utils_data.py:322-324), which silently
    truncates float [0,1] inputs — its own cached-prior resize path
    (get_guasspriors, :460-464) would return all-zero priors through it.
    For uint8 inputs (every image/frame path) behavior is identical."""
    _require_cv2()
    if channels == 1:
        img_padded = np.zeros((shape_r, shape_c), dtype=img.dtype)
    else:
        img_padded = np.zeros((shape_r, shape_c, channels), dtype=img.dtype)

    original_shape = img.shape
    rows_rate = original_shape[0] / shape_r
    cols_rate = original_shape[1] / shape_c

    if rows_rate > cols_rate:
        new_cols = (original_shape[1] * shape_r) // original_shape[0]
        img = cv2.resize(img, (new_cols, shape_r))
        new_cols = min(new_cols, shape_c)
        off = (shape_c - new_cols) // 2
        img_padded[:, off : off + new_cols] = img[:, :new_cols] if img.shape[1] > new_cols else img
    else:
        new_rows = (original_shape[0] * shape_c) // original_shape[1]
        img = cv2.resize(img, (shape_c, new_rows))
        new_rows = min(new_rows, shape_r)
        off = (shape_r - new_rows) // 2
        img_padded[off : off + new_rows, :] = img[:new_rows] if img.shape[0] > new_rows else img

    return img_padded


def resize_fixation(img: np.ndarray, rows: int = 480, cols: int = 640) -> np.ndarray:
    """Resize a binary fixation map by remapping point coordinates — NOT by
    interpolation (reference: utils_data.py:345-360)."""
    out = np.zeros((rows, cols), np.uint8)
    factor_r = rows / img.shape[0]
    factor_c = cols / img.shape[1]
    coords = np.argwhere(img)
    if coords.size:
        r = np.minimum(np.round(coords[:, 0] * factor_r).astype(int), rows - 1)
        c = np.minimum(np.round(coords[:, 1] * factor_c).astype(int), cols - 1)
        out[r, c] = 1
    return out


def padding_fixation(img: np.ndarray, shape_r: int = 480, shape_c: int = 640) -> np.ndarray:
    """Letterbox a binary fixation map via coordinate remap
    (reference: utils_data.py:362-385)."""
    img_padded = np.zeros((shape_r, shape_c), np.uint8)
    original_shape = img.shape
    if original_shape[0] == shape_r and original_shape[1] == shape_c:
        # reference quirk kept for parity (utils_data.py:366-367): same-size
        # inputs return UNCHANGED (no 0/1 binarization, aliased buffer),
        # unlike every other size which goes through resize_fixation
        return img

    rows_rate = original_shape[0] / shape_r
    cols_rate = original_shape[1] / shape_c
    if rows_rate > cols_rate:
        new_cols = (original_shape[1] * shape_r) // original_shape[0]
        rs = resize_fixation(img, rows=shape_r, cols=new_cols)
        new_cols = min(new_cols, shape_c)
        off = (shape_c - new_cols) // 2
        img_padded[:, off : off + new_cols] = rs[:, :new_cols]
    else:
        new_rows = (original_shape[0] * shape_c) // original_shape[1]
        rs = resize_fixation(img, rows=new_rows, cols=shape_c)
        new_rows = min(new_rows, shape_r)
        off = (shape_r - new_rows) // 2
        img_padded[off : off + new_rows, :] = rs[:new_rows]

    return img_padded


def normalize_frames(data, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """uint8 -> float/255 -> per-channel ImageNet standardize; channel-LAST
    layouts (..., H, W, 3). Works on numpy or jax arrays
    (reference: utils_data.py:43-65 is the channel-first twin)."""
    if hasattr(data, "dtype") and data.dtype == np.uint8:
        x = data.astype(np.float32) / 255.0
    else:
        x = data
    mean = np.asarray(mean, np.float32).reshape((1,) * (x.ndim - 1) + (3,))
    std = np.asarray(std, np.float32).reshape((1,) * (x.ndim - 1) + (3,))
    return (x - mean) / std


def im2uint8(img: np.ndarray) -> np.ndarray:
    """Clamp to [0,255], round-half-even, cast (reference: utils_data.py:68-75)."""
    if img.dtype == np.uint8:
        return img
    img = np.clip(img, 0, 255)
    return np.rint(img).astype(np.uint8)


def postprocess_prediction(pred: np.ndarray, shape_r: int, shape_c: int) -> np.ndarray:
    """Undo the letterbox: upscale so GT dims fit, center-crop, scale max to
    255 (reference: utils_data.py:289-303)."""
    _require_cv2()
    ph, pw = pred.shape[:2]
    rows_rate = shape_r / ph
    cols_rate = shape_c / pw
    if rows_rate > cols_rate:
        new_cols = (pw * shape_r) // ph
        pred = cv2.resize(pred, (new_cols, shape_r))
        off = (pred.shape[1] - shape_c) // 2
        img = pred[:, off : off + shape_c]
    else:
        new_rows = (ph * shape_c) // pw
        pred = cv2.resize(pred, (shape_c, new_rows))
        off = (pred.shape[0] - shape_r) // 2
        img = pred[off : off + shape_r, :]
    return img / np.max(img) * 255


def postprocess_visvid(pred: np.ndarray, shape_r: int, shape_c: int) -> np.ndarray:
    """Same un-letterbox without the max-normalize (reference: utils_data.py:305-319)."""
    _require_cv2()
    ph, pw = pred.shape[:2]
    rows_rate = shape_r / ph
    cols_rate = shape_c / pw
    if rows_rate > cols_rate:
        new_cols = (pw * shape_r) // ph
        pred = cv2.resize(pred, (new_cols, shape_r))
        off = (pred.shape[1] - shape_c) // 2
        return pred[:, off : off + shape_c]
    new_rows = (ph * shape_c) // pw
    pred = cv2.resize(pred, (shape_c, new_rows))
    off = (pred.shape[0] - shape_r) // 2
    return pred[off : off + shape_r, :]
