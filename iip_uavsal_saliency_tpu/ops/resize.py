"""Bilinear resizes expressed as two small matmuls (MXU-friendly).

The reference relies on two distinct bilinear conventions that must both be
reproduced for output parity:

- `F.interpolate(..., mode='bilinear', align_corners=True)`
  (reference: model.py:152-153, :360) — source coordinate
  ``src = dst * (in - 1) / (out - 1)``.
- `cv2.resize(..., INTER_LINEAR)` (reference: utils_data.py:296-300) —
  half-pixel convention ``src = (dst + 0.5) * in/out - 0.5`` with edge clamp.

Instead of gather-based interpolation we build static (out, in) interpolation
matrices per axis and contract:  out = A_h @ img @ A_w^T.  On TPU this maps
onto the MXU and fuses with neighbouring ops; shapes are static under jit so
the matrices are compile-time constants.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=128)
def interp_matrix_align_corners(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix, align_corners=True convention.

    Built in float64 (cast to the input dtype at apply time) so the f64
    reference-parity tests see full-precision interpolation weights."""
    a = np.zeros((n_out, n_in), np.float64)
    if n_out == 1 or n_in == 1:
        a[:, 0] = 1.0
        return a
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    a[np.arange(n_out), lo] = 1.0 - frac
    a[np.arange(n_out), lo + 1] += frac
    return a


@lru_cache(maxsize=128)
def interp_matrix_half_pixel(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix, half-pixel (cv2 INTER_LINEAR) convention."""
    a = np.zeros((n_out, n_in), np.float64)
    if n_in == 1:
        a[:, 0] = 1.0
        return a
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    src = np.clip(src, 0.0, n_in - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    a[np.arange(n_out), lo] = 1.0 - frac
    a[np.arange(n_out), lo + 1] += frac
    return a


def _apply_sep_resize(x: jnp.ndarray, ah: np.ndarray, aw: np.ndarray) -> jnp.ndarray:
    """Contract NHWC (or HWC / HW) input with per-axis interp matrices."""
    ah = jnp.asarray(ah, x.dtype)
    aw = jnp.asarray(aw, x.dtype)
    if x.ndim == 2:
        return ah @ x @ aw.T
    if x.ndim == 3:  # HWC
        y = jnp.einsum("oh,hwc->owc", ah, x)
        return jnp.einsum("pw,owc->opc", aw, y)
    if x.ndim == 4:  # NHWC
        y = jnp.einsum("oh,nhwc->nowc", ah, x)
        return jnp.einsum("pw,nowc->nopc", aw, y)
    raise ValueError(f"unsupported rank {x.ndim}")


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Matches torch F.interpolate(mode='bilinear', align_corners=True)."""
    h, w = (x.shape[-3], x.shape[-2]) if x.ndim >= 3 else x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _apply_sep_resize(
        x, interp_matrix_align_corners(h, out_h), interp_matrix_align_corners(w, out_w)
    )


def resize_bilinear_half_pixel(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Matches cv2.resize(..., interpolation=cv2.INTER_LINEAR) on upsampling
    and mild downsampling (cv2 INTER_LINEAR does no area averaging)."""
    h, w = (x.shape[-3], x.shape[-2]) if x.ndim >= 3 else x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _apply_sep_resize(
        x, interp_matrix_half_pixel(h, out_h), interp_matrix_half_pixel(w, out_w)
    )
