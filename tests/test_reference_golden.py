"""Golden metric/loss parity vs the reference's OWN executable code.

Imports `/root/reference/utils_score.py` (numpy suite), `utils_score_torch.py`
(torch suite — the one the reference's video eval driver actually runs,
Demo_Train_Test.py:300), and `loss_functions.py`, and pins our
`evaluation.metrics_np`, `evaluation.metrics_jax`, and `training.losses`
against them on shared inputs. The AUC samplers are seeded so the random
negative draws are bit-identical (both sides draw from np.random in the same
shapes and order), making those comparisons exact rather than statistical.

Known reference-internal inconsistency, reproduced deliberately: the numpy
suite standardizes with np.std (ddof=0, utils_score.py:24) while the torch
suite uses torch.std (ddof=1, utils_score_torch.py:49). Our metrics follow
the torch suite (the shipped eval path); the NSS comparison against the
numpy suite therefore uses a ~1e-3 relative tolerance (the ddof gap at
48x64 pixels), while every torch-suite comparison is tight.

torchvision is not needed here; skimage/hdf5storage are absent offline and
only used by code paths these tests never touch (resize-on-mismatched-shapes
and .mat IO), so they are stubbed to raise if reached.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

REF_DIR = "/root/reference"
H, W = 48, 64


def _stub(name, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


def _unreachable(*a, **k):
    raise AssertionError("stubbed dependency reached — test inputs must keep shapes equal")


@pytest.fixture(scope="module")
def ref_mods():
    _stub("skimage")
    _stub("skimage.transform", resize=_unreachable)
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]
    _stub("hdf5storage", loadmat=_unreachable, savemat=_unreachable)
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import loss_functions as ref_loss
    import utils_score as ref_np
    import utils_score_torch as ref_torch

    return ref_np, ref_torch, ref_loss


@pytest.fixture(scope="module")
def maps():
    rng = np.random.RandomState(42)
    sal = rng.rand(H, W).astype(np.float64)          # distinct values: no ties
    fmap = rng.rand(H, W).astype(np.float64)
    fpts = (rng.rand(H, W) < 0.01).astype(np.float64)
    fpts[10, 20] = 1.0
    oth = (rng.rand(H, W) < 0.02).astype(np.float64)
    oth[5, 7] = 1.0
    return sal, fmap, fpts, oth


def _t4(x):  # (H, W) -> torch (1, 1, H, W)
    return torch.from_numpy(np.asarray(x, np.float32))[None, None]


def _true4(fmap, fpts):  # torch (1, 2, H, W): [map, pts]
    return torch.cat([_t4(fmap), _t4(fpts)], dim=1)


# --------------------------------------------------------------------------- #
# metrics_np vs BOTH reference suites

def test_metrics_np_match_reference_numpy_suite(ref_mods, maps):
    ref_np, _, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation import metrics_np as ours

    sal, fmap, fpts, oth = maps
    assert ours.kld_np(sal, fmap) == pytest.approx(ref_np.KLD(sal, fmap), abs=1e-10)
    assert ours.cc_np(sal, fmap) == pytest.approx(ref_np.CC(sal, fmap), abs=1e-10)
    assert ours.sim_np(sal, fmap) == pytest.approx(ref_np.SIM(sal, fmap), abs=1e-10)
    # ddof gap (see module docstring): numpy suite uses np.std ddof=0
    assert ours.nss_np(sal, fpts) == pytest.approx(
        ref_np.NSS(sal, fpts), rel=1e-3
    )


def test_auc_judd_np_matches_reference_exactly(ref_mods, maps):
    """Same seed => the 1e-7 jitter draws are bit-identical (both sides fill
    H*W values from np.random in C order), so AUC-Judd matches exactly."""
    ref_np, _, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation.metrics_np import auc_judd_np

    sal, _, fpts, _ = maps
    np.random.seed(123)
    want = ref_np.AUC_Judd(sal, fpts, jitter=True)
    got = auc_judd_np(sal, fpts, jitter=True, rng=np.random.RandomState(123))
    assert got == pytest.approx(want, abs=1e-12)


def test_auc_borji_np_matches_reference_exactly(ref_mods, maps):
    ref_np, _, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation.metrics_np import auc_borji_np

    sal, _, fpts, _ = maps
    np.random.seed(7)
    want = ref_np.AUC_Borji(sal, fpts)
    got = auc_borji_np(sal, fpts, rng=np.random.RandomState(7))
    assert got == pytest.approx(want, abs=1e-12)


def test_auc_shuffled_np_matches_reference_exactly(ref_mods, maps):
    ref_np, _, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation.metrics_np import auc_shuffled_np

    sal, _, fpts, oth = maps
    np.random.seed(9)
    want = ref_np.AUC_shuffled(sal, fpts, oth)
    got = auc_shuffled_np(sal, fpts, oth, rng=np.random.RandomState(9))
    assert got == pytest.approx(want, abs=1e-12)


def test_metrics_np_match_reference_torch_suite(ref_mods, maps):
    """The torch suite is what evalscores_vid_torch runs — ddof=1, exactly
    our definitions (utils_score_torch.py:180-221)."""
    _, ref_t, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation import metrics_np as ours

    sal, fmap, fpts, _ = maps
    pred, true = _t4(sal), _true4(fmap, fpts)
    assert ours.kld_np(sal, fmap) == pytest.approx(
        float(ref_t.metric_kl(pred, true)), abs=1e-5
    )
    assert ours.cc_np(sal, fmap) == pytest.approx(
        float(ref_t.metric_cc(pred, true)), abs=1e-5
    )
    assert ours.nss_np(sal, fpts) == pytest.approx(
        float(ref_t.metric_nss(pred, true)), abs=1e-5
    )
    assert ours.sim_np(sal, fmap) == pytest.approx(
        float(ref_t.metric_sim(pred, true)), abs=1e-5
    )


def test_auc_torch_suite_matches(ref_mods, maps):
    """metric_auc_j (jitter off: no torch-RNG dependence; our map has no
    ties) and the seeded Borji/shuffled samplers of the torch suite."""
    _, ref_t, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation.metrics_np import (
        auc_borji_np, auc_judd_np, auc_shuffled_np)

    sal, fmap, fpts, oth = maps
    pred, true = _t4(sal), _true4(fmap, fpts)
    want_j = float(ref_t.metric_auc_j(pred, true, jitter=0))
    got_j = auc_judd_np(sal, fpts, jitter=False)
    assert got_j == pytest.approx(want_j, abs=1e-6)

    np.random.seed(21)
    want_b = float(ref_t.metric_auc_b(pred, true))
    got_b = auc_borji_np(sal, fpts, rng=np.random.RandomState(21))
    assert got_b == pytest.approx(want_b, abs=1e-6)

    np.random.seed(22)
    want_s = float(ref_t.metric_auc_s(pred, true, _t4(oth)))
    got_s = auc_shuffled_np(sal, fpts, oth, rng=np.random.RandomState(22))
    assert got_s == pytest.approx(want_s, abs=1e-6)


# --------------------------------------------------------------------------- #
# metrics_jax (the device eval path) vs the torch suite

def test_metrics_jax_match_reference_torch_suite(ref_mods, maps):
    import jax.numpy as jnp

    _, ref_t, _ = ref_mods
    from iip_uavsal_saliency_tpu.evaluation import metrics_jax as mj

    sal, fmap, fpts, _ = maps
    pred, true = _t4(sal), _true4(fmap, fpts)
    jp = jnp.asarray(sal, jnp.float32)[None, :, :, None]
    jt = jnp.asarray(np.stack([fmap, fpts], -1), jnp.float32)[None]

    assert float(mj.eval_kl(jp, jt)[0]) == pytest.approx(
        float(ref_t.metric_kl(pred, true)), abs=1e-4
    )
    assert float(mj.eval_cc(jp, jt)[0]) == pytest.approx(
        float(ref_t.metric_cc(pred, true)), abs=1e-5
    )
    assert float(mj.eval_nss(jp, jt)[0]) == pytest.approx(
        float(ref_t.metric_nss(pred, true)), abs=1e-4
    )
    assert float(mj.eval_sim(jp, jt)[0]) == pytest.approx(
        float(ref_t.metric_sim(pred, true)), abs=1e-5
    )
    # closed-form device AUC-Judd == the reference threshold loop (no ties)
    assert float(mj.eval_auc_judd(jp, jt)[0]) == pytest.approx(
        float(ref_t.metric_auc_j(pred, true, jitter=0)), abs=1e-6
    )


# --------------------------------------------------------------------------- #
# training losses vs the reference's loss_functions.py

def test_losses_match_reference(ref_mods):
    _, _, ref_loss = ref_mods
    from iip_uavsal_saliency_tpu.training import losses as ours

    rng = np.random.RandomState(3)
    n = 6
    pred = rng.rand(n, 1, H, W).astype(np.float32) * 0.9 + 0.05
    ymap = rng.rand(n, 1, H, W).astype(np.float32)
    ypts = (rng.rand(n, 1, H, W) < 0.01).astype(np.float32)
    ypts[:, :, 3, 4] = 1.0
    true = np.concatenate([ymap, ypts], 1)

    tp, tt = torch.from_numpy(pred), torch.from_numpy(true)
    jp = np.moveaxis(pred, 1, -1)
    jt = np.moveaxis(true, 1, -1)

    assert float(ours.loss_fu(jp, jt)) == pytest.approx(
        float(ref_loss.loss_fu(tp, tt)), abs=2e-5
    )
    assert float(ours.loss_kl(jp, jt)) == pytest.approx(
        float(ref_loss.loss_kl(tp, tt)), abs=2e-5
    )
    assert float(ours.loss_ml(jp, jt)) == pytest.approx(
        float(ref_loss.loss_ml(tp, tt)), abs=1e-6
    )
    # 5-D dynamic form (B, D, C, H, W) vs our (V, S, H, W, C)
    b, d = 2, 3
    tp5 = tp.reshape(b, d, 1, H, W)
    tt5 = tt.reshape(b, d, 2, H, W)
    jp5 = jp.reshape(b, d, H, W, 1)
    jt5 = jt.reshape(b, d, H, W, 2)
    assert float(ours.loss_fu_dy(jp5, jt5)) == pytest.approx(
        float(ref_loss.loss_fu_dy(tp5, tt5)), abs=2e-5
    )


# --------------------------------------------------------------------------- #
# Visualization helpers vs the reference's OWN utils_vis.py code.

@pytest.fixture(scope="module")
def ref_vis(ref_mods):
    # ref_mods already installed the hdf5storage/skimage stubs + sys.path
    import utils_vis as ref_vis_mod

    return ref_vis_mod


def test_heatmap_overlay_matches_reference(ref_vis):
    """heatmap_overlay parity (reference: utils_vis.py:34-56): uint8 and
    float heatmaps, equal and MISMATCHED shapes (the cv2.resize path)."""
    from iip_uavsal_saliency_tpu.vis.overlay import heatmap_overlay

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (H, W, 3), np.uint8)
    cases = {
        "uint8-equal": rng.randint(0, 255, (H, W), np.uint8),
        "float-equal": rng.rand(H, W).astype(np.float64),
        "uint8-resized": rng.randint(0, 255, (H // 2, W // 2), np.uint8),
        "float-resized": rng.rand(H // 2, W // 2).astype(np.float32),
    }
    for tag, hm in cases.items():
        want = ref_vis.heatmap_overlay(img, hm)
        got = heatmap_overlay(img, hm)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=tag)


def test_im2uint8_matches_reference(ref_vis):
    """im2uint8 rounding/clipping parity (reference: utils_vis.py:7-14),
    incl. the banker's-rounding of np.rint at exact .5 values."""
    from iip_uavsal_saliency_tpu.data.letterbox import im2uint8

    x = np.array([-3.0, -0.4, 0.0, 0.5, 1.5, 2.5, 254.6, 255.0, 300.0])
    np.testing.assert_array_equal(
        im2uint8(x.copy()), ref_vis.im2uint8(x.copy())
    )
    rng = np.random.RandomState(4)
    f = rng.rand(H, W) * 300 - 20
    np.testing.assert_array_equal(im2uint8(f.copy()), ref_vis.im2uint8(f.copy()))
    u = rng.randint(0, 255, (H, W), np.uint8)
    np.testing.assert_array_equal(im2uint8(u), ref_vis.im2uint8(u))


def test_resize_fixation_matches_reference(ref_vis):
    """Fixation-point coordinate remap parity (reference: utils_vis.py:16-31
    — the same remap utils_data.py uses for GT loading)."""
    from iip_uavsal_saliency_tpu.data.letterbox import resize_fixation

    rng = np.random.RandomState(5)
    pts = (rng.rand(37, 53) < 0.05).astype(np.uint8)  # odd sizes: edge rounding
    pts[36, 52] = 1  # boundary coords exercise the r==rows clamp
    for rows, cols in ((48, 64), (480, 640), (19, 101)):
        np.testing.assert_array_equal(
            resize_fixation(pts, rows=rows, cols=cols),
            ref_vis.resize_fixation(pts, rows=rows, cols=cols),
            err_msg=f"{rows}x{cols}",
        )
