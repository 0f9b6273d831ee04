"""JET-heatmap visualization: overlays, videos, per-frame exports.

Parity with the reference visualizer (reference: utils_vis.py:34-213 and
Tools/visualization_vid_frame.py): `0.8*(1-m^0.8)*img + m*map_color` blend,
optional dilated fixation dots burned to white, DIVX writer, optional
downscale to <=1280x720.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..data.letterbox import im2uint8, resize_fixation
from ..data.matio import loadmat
from ..utils.logging import get_logger

log = get_logger("vis")

EPS = 2.2204e-16


def _rescale255(img: np.ndarray) -> np.ndarray:
    """`img / max(img) * 255` with the reference's EXACT arithmetic
    (reference: utils_vis.py:100,208 — bare max, no epsilon: an epsilon in
    the divisor nudges values that land exactly on an x.5 rounding boundary
    down a uint8 level). All-zero frames (0/0 -> NaN in the reference) are
    returned unchanged instead."""
    m = np.max(img)
    return img / m * 255 if m > 0 else img


def _vid_ext(dataset: str) -> str:
    """Source-video extension per dataset (reference: utils_vis.py:118-125)."""
    d = dataset.upper()
    if d in ("CITIUS", "UAV2", "UAV2-TE"):
        return ".avi"
    if d in ("DHF1K-TE", "DHF1K"):
        return ".AVI"
    return ".mp4"


def heatmap_overlay(image: np.ndarray, heatmap: np.ndarray) -> np.ndarray:
    """JET-colormap blend (reference: utils_vis.py:34-56). Returns float in
    roughly [0, 1+]; callers re-normalize before writing."""
    import cv2

    img = np.array(image, copy=True)
    hmap = np.array(heatmap, copy=True)

    if img.shape[:2] != hmap.shape[:2]:
        hmap = cv2.resize(hmap, (img.shape[1], img.shape[0]))
    if hmap.ndim == 2:
        hmap3 = np.repeat(hmap[..., None], 3, axis=2)
    else:
        hmap3 = hmap

    if hmap3.dtype == np.uint8:
        map_color = cv2.applyColorMap(hmap3, cv2.COLORMAP_JET)
    else:
        map_color = cv2.applyColorMap(
            im2uint8(_rescale255(hmap3)), cv2.COLORMAP_JET  # bare max: utils_vis.py:48
        )

    img = img / (np.max(img) + EPS)
    hmap3 = hmap3 / (np.max(hmap3) + EPS)
    map_color = map_color / np.max(map_color)
    return 0.8 * (1 - hmap3**0.8) * img + hmap3 * map_color


def visual_img(root_dir: str, sals_dir: str, method_names: Sequence[str], with_fix: int = 0):
    """Image-dataset overlay exporter (reference: utils_vis.py:59-101)."""
    import cv2

    imgs_dir = os.path.join(root_dir, "images")
    fixs_dir = os.path.join(root_dir, "fixations", "maps")
    img_ext, sal_ext = ".jpg", ".png"

    for method in method_names:
        salmap_dir = os.path.join(sals_dir, method)
        out_path = os.path.join(salmap_dir, "Visual_color")
        os.makedirs(out_path, exist_ok=True)
        for name in sorted(f for f in os.listdir(salmap_dir) if f.endswith(sal_ext)):
            file_name = name[:-4]
            outname = os.path.join(out_path, file_name + sal_ext)
            if os.path.exists(outname):
                continue
            img = cv2.imread(os.path.join(imgs_dir, file_name + img_ext), -1)
            salmap = cv2.imread(os.path.join(salmap_dir, name), -1)
            overmap = heatmap_overlay(img, salmap)
            fixname = os.path.join(fixs_dir, file_name + ".mat")
            if with_fix and os.path.exists(fixname):
                fixmap = loadmat(fixname, "I")
                dil = cv2.dilate(fixmap, np.ones((5, 5), np.uint8))
                overmap[np.repeat(dil[..., None], 3, 2) > 0.5] = 1
            overmap = _rescale255(overmap)
            cv2.imwrite(outname, im2uint8(overmap))


def _method_source(method: str, root_dir: str, sals_dir: str):
    """(salmap_dir, mat key, filename suffix) for a method name; 'GT'
    overlays the ground-truth fixMaps (reference: utils_vis.py:125-136,
    Tools/visualization_vid_frame.py:43-50)."""
    if method.lower() == "gt":
        return os.path.join(root_dir, "maps"), "fixMap", "_fixMaps.mat"
    return os.path.join(sals_dir, method), "salmap", ".mat"


def visual_vid(
    root_dir: str,
    sal_dir: str,
    dataset: str,
    method_names: Sequence[str],
    with_color: int = 0,
    with_fix: int = 0,
    small_out: bool = True,
) -> None:
    """Overlay saliency (or GT) on source videos -> DIVX .mp4
    (reference: utils_vis.py:103-213)."""
    import cv2

    vids_dir = os.path.join(root_dir, "Videos")
    fixs_dir = os.path.join(root_dir, "fixations", "maps")
    sals_dir = os.path.join(sal_dir, "Saliency")
    vid_ext = _vid_ext(dataset)

    for method in method_names:
        salmap_dir, sal_key, sal_suffix = _method_source(method, root_dir, sals_dir)

        if with_color:
            sub = "Visual_color_fix" if with_fix else "Visual_color_map"
        else:
            sub = "Visual_gray"
        out_path = os.path.join(salmap_dir, sub)
        os.makedirs(out_path, exist_ok=True)

        for name in sorted(f for f in os.listdir(salmap_dir) if f.endswith(".mat")):
            file_name = name[: -len(sal_suffix)]
            outname = os.path.join(out_path, file_name + ".mp4")
            if os.path.exists(outname):
                continue
            cap = cv2.VideoCapture(os.path.join(vids_dir, file_name + vid_ext))
            vid_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            vid_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            vid_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            fps = cap.get(cv2.CAP_PROP_FPS) or 30

            salmap = np.rint(loadmat(os.path.join(salmap_dir, name), sal_key)).astype(np.uint8)
            nframes = min(vid_frames, salmap.shape[3])
            fixname = os.path.join(fixs_dir, file_name + "_fixPts.mat")
            fixpts = None
            if with_fix and os.path.exists(fixname):
                fixpts = loadmat(fixname, "fixLoc")
                nframes = min(nframes, fixpts.shape[3])

            fourcc = cv2.VideoWriter_fourcc("D", "I", "V", "X")
            if small_out:  # cap output at 1280x720 (reference: utils_vis.py:167-171)
                scale = min(1280 / vid_w, 720 / vid_h)
                out_w, out_h = int(vid_w * scale), int(vid_h * scale)
            else:
                out_w, out_h = vid_w, vid_h
            writer = cv2.VideoWriter(outname, fourcc, fps, (out_w, out_h), isColor=True)

            for i in range(nframes):
                isalmap = salmap[:, :, 0, i]
                if with_color:
                    ret, img = cap.read()
                    if not ret:
                        break
                    ratio = max(1, max(vid_w // 640, vid_h // 360))
                    img_small = cv2.resize(img, (vid_w // ratio, vid_h // ratio))
                    overmap = heatmap_overlay(img_small, isalmap)
                    overmap = cv2.resize(overmap, (out_w, out_h))
                else:
                    overmap = np.repeat(isalmap[..., None], 3, 2) / 255
                    if overmap.shape[:2] != (out_h, out_w):
                        # VideoWriter silently DROPS wrong-size frames; the
                        # color path resizes above, the gray path must too
                        overmap = cv2.resize(overmap, (out_w, out_h))

                if fixpts is not None:
                    pts = fixpts[:, :, 0, i]
                    if small_out:
                        pts = resize_fixation(pts, out_h, out_w)
                    dil = cv2.dilate(pts, np.ones((5, 5), np.uint8))
                    overmap[np.repeat(dil[..., None], 3, 2) > 0.5] = 1

                overmap = _rescale255(overmap)
                writer.write(im2uint8(overmap))

            cap.release()
            writer.release()
            log.info("%s/%s: %d frames", method, file_name, nframes)


def visual_vid_frames(
    root_dir: str,
    sal_dir: str,
    dataset: str,
    method_names: Sequence[str],
    frame_indices: Sequence[int] = (0,),
    with_color: int = 1,
    with_fix: int = 0,
) -> None:
    """Per-frame PNG exporter (reference: Tools/visualization_vid_frame.py:7-94)."""
    import cv2

    vids_dir = os.path.join(root_dir, "Videos")
    fixs_dir = os.path.join(root_dir, "fixations", "maps")
    sals_dir = os.path.join(sal_dir, "Saliency")
    vid_ext = _vid_ext(dataset)

    for method in method_names:
        salmap_dir, sal_key, sal_suffix = _method_source(method, root_dir, sals_dir)
        # PNGs always land in the RESULTS tree — the reference exporter
        # writes SalDir + 'frame_out/' even for GT
        # (Tools/visualization_vid_frame.py:14), never into the (possibly
        # read-only) dataset directory that GT's salmap_dir points at.
        out_path = os.path.join(sals_dir, method, "Visual_frames")
        os.makedirs(out_path, exist_ok=True)
        for name in sorted(f for f in os.listdir(salmap_dir) if f.endswith(sal_suffix)):
            file_name = name[: -len(sal_suffix)]
            salmap = np.rint(loadmat(os.path.join(salmap_dir, name), sal_key)).astype(np.uint8)
            fixname = os.path.join(fixs_dir, file_name + "_fixPts.mat")
            fixpts = None
            if with_fix and os.path.exists(fixname):
                fixpts = loadmat(fixname, "fixLoc")
            cap = cv2.VideoCapture(os.path.join(vids_dir, file_name + vid_ext))
            for fi in frame_indices:
                if fi >= salmap.shape[3]:
                    continue
                cap.set(cv2.CAP_PROP_POS_FRAMES, fi)
                ret, img = cap.read()
                if not ret:
                    continue
                overmap = heatmap_overlay(img, salmap[:, :, 0, fi]) if with_color else (
                    np.repeat(salmap[:, :, 0, fi][..., None], 3, 2) / 255
                )
                if fixpts is not None and fi < fixpts.shape[3]:
                    pts = fixpts[:, :, 0, fi]
                    if pts.shape != overmap.shape[:2]:
                        pts = resize_fixation(pts, overmap.shape[0], overmap.shape[1])
                    dil = cv2.dilate(pts, np.ones((5, 5), np.uint8))
                    overmap[np.repeat(dil[..., None], 3, 2) > 0.5] = 1
                overmap = _rescale255(overmap)
                cv2.imwrite(
                    os.path.join(out_path, f"{file_name}_f{fi:05d}.png"), im2uint8(overmap)
                )
                if with_color:  # raw source frame alongside the overlay
                    # (reference: Tools/visualization_vid_frame.py:90-92)
                    imgname = os.path.join(out_path, f"{file_name}_f{fi:05d}_frame.png")
                    if not os.path.exists(imgname):
                        cv2.imwrite(imgname, img)
            cap.release()
