"""Prior map construction: analytic center-bias Gaussians + dataset-observed
mean maps.

Parity with the reference prior pipeline (reference: utils_data.py:388-604):
- `gaussian_priors`: 8 isotropic center Gaussians, sigma = e*k/16 (k=1..8),
  e = height/width (st_get_gaussmaps, :391-412).
- `dy_gaussian_priors`: the anisotropic variant (:414-447).
- `get_gauss_priors`: min-max normalized, cached to `gauss_priors.mat`
  key `PriorMaps` (:449-469). Can consume the reference's shipped cache.
- observed priors: per-video temporal-mean fixation maps -> PNGs ->
  stacked/averaged into 20 channels, cached to
  `<DS>_ob_priors_train.mat` (:497-604).

Returned priors are channel-last (H, W, C) float32 — the single-map form the
model broadcasts over frames (the reference tiles per-frame copies instead;
see models/uavsal.py docstring).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from .letterbox import padding
from .matio import loadmat, savemat

EPS = 2.2204e-16


def gaussian_priors(height: int, width: int, nb_gaussian: int = 8) -> np.ndarray:
    """(H, W, nb) center Gaussians, sigma_x = sigma_y = e*k/16
    (reference: utils_data.py:391-412)."""
    e = height / width
    e1 = (1 - e) / 2
    e2 = e1 + e

    mu_x = np.full(nb_gaussian, 0.5)
    mu_y = np.full(nb_gaussian, 0.5)
    sigma_x = e * np.arange(1, nb_gaussian + 1) / 16
    sigma_y = sigma_x

    x_t = np.ones((height, 1)) @ np.linspace(0.0, 1.0, width).reshape(1, width)
    y_t = np.linspace(e1, e2, height).reshape(height, 1) @ np.ones((1, width))
    x_t = np.repeat(x_t[..., None], nb_gaussian, axis=2)
    y_t = np.repeat(y_t[..., None], nb_gaussian, axis=2)

    return (
        1.0
        / (2 * np.pi * sigma_x * sigma_y + EPS)
        * np.exp(
            -(
                (x_t - mu_x) ** 2 / (2 * sigma_x**2 + EPS)
                + (y_t - mu_y) ** 2 / (2 * sigma_y**2 + EPS)
            )
        )
    )


def dy_gaussian_priors(height: int, width: int, nb_gaussian: int = 8) -> np.ndarray:
    """Anisotropic variant (reference: utils_data.py:414-447)."""
    if nb_gaussian != 8:
        raise ValueError(
            "dy priors define exactly 8 sigma pairs (reference "
            f"utils_data.py:423-426); got nb_gaussian={nb_gaussian}"
        )
    e = height / width
    e1 = (1 - e) / 2
    e2 = e1 + e

    mu_x = np.full(nb_gaussian, 0.5)
    mu_y = np.full(nb_gaussian, 0.5)
    sigma_x = np.array([1 / 4, 1 / 4, 1 / 4, 1 / 4, 1 / 2, 1 / 2, 1 / 2, 1 / 2])
    sigma_y = e * np.array([1 / 16, 1 / 8, 3 / 16, 1 / 4, 1 / 8, 1 / 4, 3 / 8, 1 / 2])

    x_t = np.ones((height, 1)) @ np.linspace(0.0, 1.0, width).reshape(1, width)
    y_t = np.linspace(e1, e2, height).reshape(height, 1) @ np.ones((1, width))
    x_t = np.repeat(x_t[..., None], nb_gaussian, axis=2)
    y_t = np.repeat(y_t[..., None], nb_gaussian, axis=2)

    return (
        1.0
        / (2 * np.pi * sigma_x * sigma_y + EPS)
        * np.exp(
            -(
                (x_t - mu_x) ** 2 / (2 * sigma_x**2 + EPS)
                + (y_t - mu_y) ** 2 / (2 * sigma_y**2 + EPS)
            )
        )
    )


def get_gauss_priors(
    shape_r: int = 45,
    shape_c: int = 80,
    channels: int = 8,
    cache_dir: str = "",
    kind: str = "st",
) -> np.ndarray:
    """Min-max normalized Gaussian priors (H, W, C) float32, cached as
    `gauss_priors.mat` key `PriorMaps` (reference: utils_data.py:449-469).
    Consumes the reference's shipped cache when present.

    The default (kind='st', channels=8) keeps the reference's exact cache
    filename; other variants get a suffixed name so a kind='dy' request can
    never silently return a cached 'st' tensor (the reference keys its cache
    on filename alone and has this aliasing bug)."""
    name = (
        "gauss_priors.mat"
        if (kind == "st" and channels == 8)
        else f"gauss_priors_{kind}{channels}.mat"
    )
    cache = os.path.join(cache_dir, name) if cache_dir else name
    if not os.path.exists(cache):
        gen = dy_gaussian_priors if kind == "dy" else gaussian_priors
        ims = gen(shape_r, shape_c, channels)
        ims = (ims - ims.min((0, 1))) / (ims.max((0, 1)) - ims.min((0, 1)) + EPS)
        ims = ims.astype(np.float32)
        try:
            savemat(cache, {"PriorMaps": ims})
        except OSError:
            pass  # read-only cwd: serve uncached
        return ims

    ims = loadmat(cache, "PriorMaps")
    if ims.shape[0] != shape_r or ims.shape[1] != shape_c:
        # float32 buffers: cached priors are float in [0,1]; the reference's
        # uint8 resize path here (utils_data.py:460-464) truncates them all
        # to zero — clearly unintended, not reproduced
        ims_rs = np.zeros((shape_r, shape_c, ims.shape[2]), np.float32)
        for i in range(ims.shape[2]):
            ims_rs[:, :, i] = padding(ims[:, :, i].astype(np.float32), shape_r, shape_c, 1)
        ims = ims_rs
    return np.asarray(ims, np.float32)


def make_mean_maps(datapath: str, save_frames: float = float("inf")) -> None:
    """Per-video temporal-mean fixation maps -> `<datapath>/priors/<vid>.png`
    (reference: utils_data.py:497-520)."""
    import cv2

    out_dir = os.path.join(datapath, "priors")
    os.makedirs(out_dir, exist_ok=True)
    maps_dir = os.path.join(datapath, "maps")
    vid_names = sorted(f for f in os.listdir(maps_dir) if f.endswith(".mat"))
    for name in vid_names:
        file_name = name[:-12]  # strip '_fixMaps.mat'
        fixmap = loadmat(os.path.join(maps_dir, name), "fixMap")
        num = int(min(save_frames, fixmap.shape[3]))
        priormap = np.mean(fixmap[:, :, 0, :num], axis=2)
        n_priormap = 255 * (priormap - priormap.min()) / (priormap.max() - priormap.min() + EPS)
        cv2.imwrite(os.path.join(out_dir, file_name + ".png"), n_priormap)


def _read_ob_prior_list(datapath: str, phase_gen: str = "train", prior_ext: str = ".png"):
    txt_dir = os.path.join(datapath, "txt")
    priors_dir = os.path.join(datapath, "priors")
    names = []
    phases = ["train"] if phase_gen == "train" else ["train", "val"]
    if phase_gen not in ("train", "train_val"):
        raise NotImplementedError(phase_gen)
    for ph in phases:
        with open(os.path.join(txt_dir, ph + ".txt")) as f:
            names += [line.strip() for line in f if line.strip()]
    return sorted(os.path.join(priors_dir, n + prior_ext) for n in names)


def get_ob_priors(
    datapath: str,
    dataset: str = "",
    phase_gen: str = "train",
    shape_r: int = 45,
    shape_c: int = 80,
    channels: int = 20,
    cache_dir: str = "",
) -> np.ndarray:
    """Observed priors (H, W, 20) float32, cached to
    `<DS>_ob_priors_train[_val].mat` (reference: utils_data.py:552-604).
    Consumes the reference's shipped caches directly."""
    import cv2

    suffix = "_ob_priors_train.mat" if phase_gen == "train" else "_ob_priors_train_val.mat"
    cache = os.path.join(cache_dir, dataset.upper() + suffix)

    if not os.path.exists(cache):
        priors_list = _read_ob_prior_list(datapath, phase_gen)
        if not priors_list:
            raise ValueError(
                f"empty {phase_gen} split under {datapath}/txt — no videos "
                "to build observed priors from"
            )
        # regenerate if ANY prior PNG is missing (a cache built when only
        # part of the split existed leaves holes beyond priors_list[0])
        if not all(os.path.exists(p) for p in priors_list):
            make_mean_maps(datapath)
        maps = np.zeros((shape_r, shape_c, max(channels, len(priors_list))), np.uint8)
        for i, path in enumerate(priors_list):
            original = cv2.imread(path, 0)
            if original is None:
                raise FileNotFoundError(f"unreadable observed-prior map: {path}")
            maps[:, :, i] = padding(original, shape_r, shape_c, 1)
        if channels < len(priors_list):
            count = len(priors_list) // channels
            frames = channels * count
            tail_mean = np.mean(maps[:, :, frames - count :], axis=2)
            maps = maps[:, :, :frames].reshape((shape_r, shape_c, channels, count))
            maps = np.mean(maps, axis=3)
            maps[:, :, -1] = tail_mean
        maps = maps.astype(np.float32) / 255
        savemat(cache, {"PriorMaps": maps})
    else:
        maps = loadmat(cache, "PriorMaps")

    if maps.shape[0] != shape_r or maps.shape[1] != shape_c:
        # float32 buffers (see get_gauss_priors: the reference's uint8 path
        # would zero the cached [0,1] maps)
        maps_rs = np.zeros((shape_r, shape_c, maps.shape[2]), np.float32)
        for i in range(maps.shape[2]):
            maps_rs[:, :, i] = padding(maps[:, :, i].astype(np.float32), shape_r, shape_c, 1)
        maps = maps_rs
    return np.asarray(maps, np.float32)
