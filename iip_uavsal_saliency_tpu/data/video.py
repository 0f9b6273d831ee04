"""Video decode / encode and per-video GT preprocessing.

Host-side pipeline with exact parity to the reference
(reference: utils_data.py:229-287 preprocess_*, :84-93 saveVid). Decoded
frames stay uint8 through the letterbox so the arrays shipped to the device
are 4x smaller; normalization happens on-chip (see letterbox.normalize_frames).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .letterbox import im2uint8, normalize_frames, padding, padding_fixation
from .matio import loadmat

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _read_frames(cap, max_frames, transform):
    """Decode until cap.read() fails (or max_frames), writing into a buffer
    preallocated from the header frame count. The header is a capacity HINT,
    not a bound: headers that UNDERcount (VFR / stream-muxed files, count=0
    webms) grow geometrically in place (amortized O(n) copy work); headers
    that mildly OVERcount trim to a view; headers that overcount 2x+ (or by
    >256 MB of slack) trim with a copy (so the oversized base buffer is
    freed). The INITIAL
    prealloc is capped at ~4 GiB against corrupt headers claiming billions
    of frames — legitimately longer videos still decode, growing past the
    cap by doubling (peak transient RAM during a growth step is old+new,
    ~1.5x the data; never the ~3x of a per-frame list + stack + concatenate).
    No fabricated black frames, no dropped tails.

    Returns (frames or None if zero frames decoded, n)."""
    header_n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    n = 0
    buf = None
    while n < max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        f = transform(frame)
        if buf is None:
            hint = int(min(header_n, max_frames)) if header_n > 0 else 0
            # a corrupt header claiming billions of frames must not drive the
            # upfront np.empty: cap the FIRST allocation at ~4 GiB — real
            # frames past it grow the buffer below
            cap_frames = max(1, (4 << 30) // max(f.nbytes, 1))
            buf = np.empty((min(hint, cap_frames),) + f.shape, f.dtype)
        if n == buf.shape[0]:
            # full (undercounting header, or the corrupt-header cap): double,
            # but never past a still-credible header hint — a legit long
            # video that exceeded the prealloc cap grows toward its header
            # count instead of overshooting it by up to 2x
            new_n = max(2 * n, 16)
            if header_n > n:
                new_n = max(min(new_n, int(min(header_n, max_frames))), n + 1)
            grown = np.empty((new_n,) + f.shape, f.dtype)
            grown[:n] = buf
            buf = grown
        buf[n] = f
        n += 1
    if buf is None:
        return None, 0
    slack_bytes = (buf.shape[0] - n) * buf[0].nbytes
    if n * 2 < buf.shape[0] or slack_bytes > (256 << 20):
        # overcounting header: buf[:n] is a view pinning the whole hint-sized
        # base allocation for the array's lifetime — copy so it's released
        # (relative 2x slack, or >256 MB absolute slack on long videos)
        frames = buf[:n].copy()
    else:
        frames = buf[:n]
    return frames, n


def decode_video(path: str, max_frames: float = float("inf")) -> Tuple[np.ndarray, int, int, int]:
    """Decode all frames (BGR uint8). Returns (frames(T,H,W,3), n, height, width).

    See _read_frames for the header-count-as-hint decode semantics."""
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) required for video decode")
    cap = cv2.VideoCapture(path)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    frames, n = _read_frames(cap, max_frames, lambda f: f)
    cap.release()
    if frames is None:
        frames = np.zeros((0, height, width, 3), np.uint8)
    return frames, n, height, width


def probe_nframes(path: str) -> int:
    """Frame count from the container header only — no decode. Used to
    length-bucket multi-video training groups (like-length videos share a
    group, so padded fully-masked clips are rare)."""
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) required for video probe")
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    return n


def preprocess_videos(
    path: str,
    shape_r: int,
    shape_c: int,
    frames: float = float("inf"),
    mode: str = "RGB",
    normalize: bool = True,
):
    """Decode + letterbox (+ optional normalize), matching reference
    utils_data.py:255-287. Returns (frames, nframes, height, width)."""
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) required for video decode")
    cap = cv2.VideoCapture(path)
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    # Header frame counts lie in both directions; _read_frames decodes until
    # cap.read() fails. Every consumer pairs frames with GT by min(), so
    # extra real frames are safe and missing fabricated ones are a
    # correctness fix.
    ims, nframes = _read_frames(
        cap, frames, lambda f: padding(f, shape_r, shape_c, 3)
    )
    cap.release()
    if ims is None:
        ims = np.zeros((0, shape_r, shape_c, 3), np.uint8)

    if mode == "RGB":
        ims = ims[:, :, :, [2, 1, 0]]
        mean = [0.485, 0.456, 0.406]
        std = [0.229, 0.224, 0.225]
    elif mode == "BGR":
        mean = [0.406, 0.456, 0.485]
        std = [0.225, 0.224, 0.229]
    else:
        raise ValueError(mode)

    if normalize:
        ims = normalize_frames(ims, mean, std)
    return ims, nframes, height, width


def preprocess_vidmaps(path: str, shape_r: int, shape_c: int, frames: float = float("inf")):
    """Load blurred GT maps (H,W,1,T) -> letterboxed (T, shape_r, shape_c, 1)
    uint8 (reference: utils_data.py:229-240)."""
    fixmaps = loadmat(path, "fixMap")
    nframes = int(min(fixmaps.shape[3], frames))
    ims = np.zeros((nframes, shape_r, shape_c, 1), np.uint8)
    for i in range(nframes):
        ims[i, :, :, 0] = padding(fixmaps[:, :, :, i], shape_r, shape_c, 1)
    return ims


def preprocess_vidfixs(path: str, shape_r: int, shape_c: int, frames: float = float("inf")):
    """Load binary fixation points (H,W,1,T) -> coordinate-remapped letterbox
    (T, shape_r, shape_c, 1) uint8 (reference: utils_data.py:242-253)."""
    fixmaps = loadmat(path, "fixLoc")
    nframes = int(min(fixmaps.shape[3], frames))
    ims = np.zeros((nframes, shape_r, shape_c, 1), np.uint8)
    for i in range(nframes):
        ims[i, :, :, 0] = padding_fixation(fixmaps[:, :, 0, i], shape_r, shape_c)
    return ims


def save_video(savename: str, data: np.ndarray, fps: int = 30) -> None:
    """(H, W, C, T) -> DIVX .avi/.mp4 (reference: utils_data.py:84-93)."""
    if cv2 is None:
        raise RuntimeError("OpenCV (cv2) required for video encode")
    h, w, c, nframes = data.shape
    fourcc = cv2.VideoWriter_fourcc("D", "I", "V", "X")
    writer = cv2.VideoWriter(savename, fourcc, fps, (w, h), isColor=True)
    for i in range(nframes):
        writer.write(im2uint8(data[:, :, :, i]))
    writer.release()
