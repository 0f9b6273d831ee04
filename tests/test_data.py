"""Data layer tests: letterbox parity, priors math, MATLAB v7.3 I/O round-trip
(validated against the reference's shipped hdf5storage-written .mat assets)."""

import os

import numpy as np
import pytest

from iip_uavsal_saliency_tpu.data.letterbox import (
    im2uint8,
    normalize_frames,
    padding,
    padding_fixation,
    postprocess_prediction,
    resize_fixation,
)
from iip_uavsal_saliency_tpu.data.matio import loadmat, savemat
from iip_uavsal_saliency_tpu.data.priors import (
    dy_gaussian_priors,
    gaussian_priors,
    get_gauss_priors,
)

REF_DIR = "/root/reference"


def test_padding_landscape_into_wider():
    """720x1280 -> 360x640: pure resize, no pad."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (720, 1280, 3), np.uint8)
    out = padding(img, 360, 640, 3)
    assert out.shape == (360, 640, 3)
    assert out[0].any()  # no top pad


def test_padding_tall_image_pads_columns():
    img = np.full((100, 50), 200, np.uint8)
    out = padding(img, 50, 100, 1)
    assert out.shape == (50, 100)
    # rows_rate (2) > cols_rate (0.5): resized to 25 cols centered
    assert (out[:, :37] == 0).all() and (out[:, 38:62] > 0).all()


def test_padding_fixation_remaps_points():
    img = np.zeros((90, 160), np.uint8)
    img[45, 80] = 1
    out = padding_fixation(img, 45, 80)
    assert out.shape == (45, 80)
    assert out.sum() == 1
    r, c = np.argwhere(out)[0]
    assert abs(r - 22) <= 1 and abs(c - 40) <= 1


def test_resize_fixation_count_preserved_upscale():
    img = np.zeros((45, 80), np.uint8)
    img[[3, 20, 40], [5, 40, 70]] = 1
    out = resize_fixation(img, 720, 1280)
    assert out.sum() == 3


def test_normalize_frames():
    x = np.full((2, 4, 4, 3), 255, np.uint8)
    out = normalize_frames(x)
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_im2uint8():
    x = np.array([-5.0, 0.4, 128.5, 300.0])
    np.testing.assert_array_equal(im2uint8(x), [0, 0, 128, 255])


def test_postprocess_prediction_roundtrip_shape():
    pred = np.random.RandomState(1).rand(45, 80).astype(np.float32)
    out = postprocess_prediction(pred, 720, 1280)
    assert out.shape == (720, 1280)
    assert abs(out.max() - 255.0) < 1e-3


def test_gaussian_priors_formula():
    g = gaussian_priors(45, 80, 8)
    assert g.shape == (45, 80, 8)
    # symmetric around center; peak at center for all sigmas
    for k in range(8):
        m = g[:, :, k]
        r, c = np.unravel_index(m.argmax(), m.shape)
        assert abs(r - 22) <= 1 and abs(c - 40) <= 1
    # wider sigma -> flatter map
    assert g[:, :, 0].max() > g[:, :, 7].max()


def test_dy_gaussian_priors_shape():
    g = dy_gaussian_priors(45, 80, 8)
    assert g.shape == (45, 80, 8)


def test_matio_roundtrip(tmp_path):
    path = str(tmp_path / "t.mat")
    a = np.random.RandomState(0).rand(45, 80, 8).astype(np.float32)
    b = np.random.RandomState(1).randint(0, 255, (720, 1280, 1, 7), np.uint8)
    savemat(path, {"PriorMaps": a, "salmap": b})
    md = loadmat(path)
    np.testing.assert_array_equal(md["PriorMaps"], a)
    np.testing.assert_array_equal(md["salmap"], b)
    # userblock: MATLAB 7.3 header present
    with open(path, "rb") as f:
        head = f.read(128)
    assert head.startswith(b"MATLAB 7.3 MAT-file")
    assert head[124:126] == b"\x00\x02" and head[126:128] == b"IM"


@pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference assets not mounted")
def test_loadmat_reads_reference_assets():
    """Our reader must consume hdf5storage-written v7.3 files with the layout
    the reference documents: PriorMaps 45x80x8 / 45x80x20 float32."""
    g = loadmat(os.path.join(REF_DIR, "gauss_priors.mat"), "PriorMaps")
    assert g.shape == (45, 80, 8) and g.dtype == np.float32
    ob = loadmat(os.path.join(REF_DIR, "UAV2_ob_priors_train.mat"), "PriorMaps")
    assert ob.shape == (45, 80, 20) and ob.dtype == np.float32
    assert 0.0 <= float(g.min()) and float(g.max()) <= 1.0 + 1e-6


@pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference assets not mounted")
def test_gauss_priors_match_reference_cache():
    """Analytic generation == the reference's shipped cache (same formula)."""
    ref = loadmat(os.path.join(REF_DIR, "gauss_priors.mat"), "PriorMaps")
    ours = get_gauss_priors(45, 80, 8, cache_dir="/nonexistent_dir_forces_generate")
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_get_gauss_priors_cache_roundtrip(tmp_path):
    d = str(tmp_path)
    a = get_gauss_priors(45, 80, 8, cache_dir=d)
    assert os.path.exists(os.path.join(d, "gauss_priors.mat"))
    b = get_gauss_priors(45, 80, 8, cache_dir=d)  # from cache
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_get_gauss_priors_resize_from_cache_keeps_float(tmp_path):
    """Resizing a cached float [0,1] prior must NOT truncate to zero.
    (The reference's own resize path, utils_data.py:460-464, routes floats
    through a uint8 buffer and would return all-zero priors — a documented
    deliberate divergence; see letterbox.padding.)"""
    d = str(tmp_path)
    get_gauss_priors(45, 80, 8, cache_dir=d)            # cache at 45x80
    r = get_gauss_priors(24, 40, 8, cache_dir=d)        # resized from cache
    assert r.shape == (24, 40, 8) and r.dtype == np.float32
    assert r.max() > 0.5 and (r > 0).mean() > 0.5


def test_get_gauss_priors_kind_not_aliased(tmp_path):
    """A kind='dy' request must not silently return the cached 'st' tensor
    (the reference keys its cache on filename alone)."""
    d = str(tmp_path)
    st = get_gauss_priors(45, 80, 8, cache_dir=d)
    dy = get_gauss_priors(45, 80, 8, cache_dir=d, kind="dy")
    assert os.path.exists(os.path.join(d, "gauss_priors_dy8.mat"))
    assert not np.allclose(dy, st)


def test_padding_preserves_float_dtype():
    x = np.full((10, 20), 0.5, np.float32)
    out = padding(x, 16, 16, 1)
    assert out.dtype == np.float32
    assert out.max() > 0.4  # uint8 buffer would truncate 0.5 -> 0


def test_get_video_list_shuffle_pairs_correctly(tmp_path):
    """shuffle=True must keep (video, fixMaps, fixPts) referring to the SAME
    video: os.listdir order is arbitrary per directory, so raw zip can pair
    video A with video B's ground truth."""
    from iip_uavsal_saliency_tpu.data.lists import get_video_list

    base = os.path.join(str(tmp_path), "train")
    os.makedirs(os.path.join(base, "videos"))
    os.makedirs(os.path.join(base, "maps"))
    os.makedirs(os.path.join(base, "fixations", "maps"))
    names = ["zeta", "alpha", "mid"]
    for n in names:
        for p in (os.path.join(base, "videos", n + ".avi"),
                  os.path.join(base, "maps", n + "_fixMaps.mat"),
                  os.path.join(base, "fixations", "maps", n + "_fixPts.mat")):
            open(p, "w").close()
    videos, vmaps, vfixs = get_video_list(str(tmp_path), "train", shuffle=True)
    for v, m, f in zip(videos, vmaps, vfixs):
        stem = os.path.basename(v)[:-4]
        assert os.path.basename(m) == stem + "_fixMaps.mat", (v, m)
        assert os.path.basename(f) == stem + "_fixPts.mat", (v, f)
    # unpaired listing is an error, not silent truncation
    os.remove(os.path.join(base, "maps", "mid_fixMaps.mat"))
    with pytest.raises(ValueError):
        get_video_list(str(tmp_path), "train", shuffle=False)


def test_savemat_compresses_large_arrays(tmp_path):
    """Arrays over the 16 KiB threshold gzip on disk (hdf5storage-style);
    small arrays skip the filter. Roundtrip stays exact either way."""
    import h5py

    from iip_uavsal_saliency_tpu.data.matio import loadmat, savemat

    big = (np.arange(720 * 128, dtype=np.uint8) % 97).reshape(720, 128)
    small = np.arange(12, dtype=np.float32)
    p = str(tmp_path / "c.mat")
    savemat(p, {"big": big, "small": small})
    with h5py.File(p, "r") as f:
        assert f["big"].compression == "gzip"
        assert f["small"].compression is None
    np.testing.assert_array_equal(loadmat(p, "big"), big)
    np.testing.assert_array_equal(loadmat(p, "small"), small)
    # compressible content actually shrinks vs raw nbytes
    assert os.path.getsize(p) < big.nbytes


def test_dy_priors_reject_non8():
    from iip_uavsal_saliency_tpu.data.priors import dy_gaussian_priors

    with pytest.raises(ValueError, match="8 sigma"):
        dy_gaussian_priors(45, 80, nb_gaussian=16)
    assert dy_gaussian_priors(45, 80, nb_gaussian=8).shape == (45, 80, 8)


class _FakeCap:
    """cv2.VideoCapture stand-in with a (possibly lying) header count."""

    def __init__(self, frames, header_count):
        self._frames = list(frames)
        self._header = header_count
        self._i = 0

    def get(self, prop):
        return self._header

    def read(self):
        if self._i >= len(self._frames):
            return False, None
        f = self._frames[self._i]
        self._i += 1
        return True, f


@pytest.mark.parametrize("header", [3, 7, 0, -1])
def test_read_frames_header_is_hint_not_bound(header):
    """_read_frames preallocates from the header frame count but treats it
    as a HINT: overcounting headers trim (no fabricated frames),
    undercounting / zero / negative headers still decode every real frame."""
    from iip_uavsal_saliency_tpu.data.video import _read_frames

    frames = [np.full((4, 6, 3), i, np.uint8) for i in range(5)]
    got, n = _read_frames(_FakeCap(frames, header), float("inf"), lambda f: f)
    assert n == 5 and got.shape == (5, 4, 6, 3)
    np.testing.assert_array_equal(got, np.stack(frames))


def test_read_frames_overcount_releases_base_buffer():
    """A 2x+ overcounting header must not pin the hint-sized allocation:
    the returned array owns its memory (copy), and a corrupt header claiming
    billions of frames is capped at ~4 GiB of prealloc (real frames past the
    cap grow the buffer geometrically, so nothing is dropped)."""
    from iip_uavsal_saliency_tpu.data.video import _read_frames

    frames = [np.full((4, 6, 3), i, np.uint8) for i in range(3)]
    got, n = _read_frames(_FakeCap(frames, 100), float("inf"), lambda f: f)
    assert n == 3 and got.shape == (3, 4, 6, 3)
    np.testing.assert_array_equal(got, np.stack(frames))
    assert got.base is None, "trimmed view would pin the 100-frame buffer"

    # corrupt huge header: prealloc capped (would be ~70 TB otherwise), all
    # real frames still decoded
    got, n = _read_frames(_FakeCap(frames, 10**9), float("inf"), lambda f: f)
    assert n == 3 and got.shape[0] == 3
    np.testing.assert_array_equal(got, np.stack(frames))

    # undercounting header still grows (geometric doubling, owns its memory)
    frames8 = [np.full((1, 1, 3), i, np.uint8) for i in range(8)]
    got, n = _read_frames(_FakeCap(frames8, 6), float("inf"), lambda f: f)
    assert n == 8 and got.shape[0] == 8
    np.testing.assert_array_equal(got, np.stack(frames8))


def test_read_frames_respects_max_frames_and_empty():
    from iip_uavsal_saliency_tpu.data.video import _read_frames

    frames = [np.full((4, 6, 3), i, np.uint8) for i in range(5)]
    got, n = _read_frames(_FakeCap(frames, 5), 2, lambda f: f)
    assert n == 2 and got.shape[0] == 2
    got, n = _read_frames(_FakeCap([], 9), float("inf"), lambda f: f)
    assert got is None and n == 0
