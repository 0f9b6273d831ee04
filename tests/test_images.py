"""SALICON image stage: dataset loader, SRFNetImage model, transplant, eval."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")
import scipy.io

from iip_uavsal_saliency_tpu.data.images import (
    load_salicon_example,
    salicon_batches,
    salicon_file_lists,
)
from iip_uavsal_saliency_tpu.data.matio import loadmat
from iip_uavsal_saliency_tpu.evaluation.scorer import (
    evalscores_img,
    evalscores_img_sum,
    mean_scores_img,
)
from iip_uavsal_saliency_tpu.models import SRFNetImage, UAVSal, init_variables, transfer_sfnet

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

IOSIZE = (64, 64, 8, 8)
N_IMG = 5


@pytest.fixture(scope="module")
def salicon_root(tmp_path_factory):
    """Tiny SALICON-layout dataset: 5 train + 3 val images, 32x48 native."""
    root = tmp_path_factory.mktemp("salicon")
    rng = np.random.RandomState(0)
    for classes, n in [("train", N_IMG), ("val", 3)]:
        for d in ["images", "maps", os.path.join("fixations", "maps")]:
            os.makedirs(os.path.join(root, classes, d), exist_ok=True)
        for i in range(n):
            name = f"img_{i:03d}"
            img = rng.randint(0, 255, (32, 48, 3), np.uint8)
            cv2.imwrite(os.path.join(root, classes, "images", name + ".jpg"), img)
            m = rng.randint(0, 255, (32, 48), np.uint8)
            cv2.imwrite(os.path.join(root, classes, "maps", name + ".png"), m)
            fix = (rng.rand(32, 48) > 0.98).astype(np.uint8)
            fix[16, 24] = 1
            scipy.io.savemat(
                os.path.join(root, classes, "fixations", "maps", name + ".mat"),
                {"I": fix},
            )
    return str(root)


def test_file_lists_and_example(salicon_root):
    imgs, maps, fixs = salicon_file_lists(salicon_root, "train")
    assert len(imgs) == len(maps) == len(fixs) == N_IMG
    x, y = load_salicon_example(imgs[0], maps[0], fixs[0], IOSIZE)
    assert x.shape == (64, 64, 3) and x.dtype == np.float32
    assert y.shape == (8, 8, 2)
    assert y[..., 0].max() <= 1.0
    assert set(np.unique(y[..., 1])) <= {0.0, 1.0}
    assert y[..., 1].sum() >= 1  # coordinate remap keeps fixations


def test_salicon_batches(salicon_root):
    batches = list(salicon_batches(salicon_root, "train", IOSIZE, batch_size=2))
    assert sum(b[0].shape[0] for b in batches) == N_IMG
    x, y = batches[0]
    assert x.shape == (2, 64, 64, 3) and y.shape == (2, 8, 8, 2)


@pytest.fixture(scope="module")
def srfnet_image_model():
    model = SRFNetImage()
    x = jnp.zeros((1, 64, 64, 3))
    variables = init_variables(model, jax.random.PRNGKey(0), x)
    return model, variables


def test_srfnet_image_forward(srfnet_image_model):
    model, variables = srfnet_image_model
    y = model.apply(variables, jnp.ones((2, 64, 64, 3)))
    assert y.shape == (2, 8, 8, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_transfer_sfnet(srfnet_image_model, uavsal_small):
    img_model, img_vars = srfnet_image_model
    _, vid_vars, _ = uavsal_small
    out = transfer_sfnet(img_vars, vid_vars)
    got = out["params"]["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"]
    want = img_vars["params"]["sfnet"]["conv_last"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # untouched subtree intact
    np.testing.assert_array_equal(
        np.asarray(out["params"]["rnn"]["kernel"]),
        np.asarray(vid_vars["params"]["rnn"]["kernel"]),
    )


def test_evalscores_img_roundtrip(salicon_root, tmp_path):
    """Synthetic predictions -> both image eval drivers -> mean scores."""
    val_dir = os.path.join(salicon_root, "val")
    res_dir = str(tmp_path / "Results")
    method = "TestMethod"
    sal_dir = os.path.join(res_dir, "Saliency", method)
    os.makedirs(sal_dir, exist_ok=True)
    rng = np.random.RandomState(1)
    maps_dir = os.path.join(val_dir, "maps")
    for f in sorted(os.listdir(maps_dir)):
        gt = cv2.imread(os.path.join(maps_dir, f), -1).astype(np.float32)
        noisy = np.clip(gt + rng.rand(*gt.shape) * 40, 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(sal_dir, f), noisy)

    evalscores_img(val_dir, res_dir, "SALTEST", [method], rng=np.random.RandomState(2))
    scores = loadmat(os.path.join(res_dir, "Scores", f"Score_{method}.mat"), "scores")
    assert scores.shape == (3, 7)
    assert np.isfinite(scores).all()

    evalscores_img_sum(val_dir, res_dir, "SALTEST", [method], rng=np.random.RandomState(3))
    means = mean_scores_img(res_dir, [method])
    assert 0.0 <= means[method]["AUC_Judd"] <= 1.0
    assert means[method]["CC"] > 0.3  # noisy copy of GT correlates

def test_visual_img(salicon_root, tmp_path):
    """Image overlay exporter (reference: utils_vis.py:59-101)."""
    from iip_uavsal_saliency_tpu.vis.overlay import visual_img

    val_dir = os.path.join(salicon_root, "val")
    sals = str(tmp_path / "Saliency")
    os.makedirs(os.path.join(sals, "M"), exist_ok=True)
    rng = np.random.RandomState(0)
    for f in sorted(os.listdir(os.path.join(val_dir, "maps"))):
        cv2.imwrite(os.path.join(sals, "M", f), rng.randint(0, 255, (32, 48), np.uint8))
    visual_img(val_dir, sals, ["M"])
    out = os.path.join(sals, "M", "Visual_color")
    assert len(os.listdir(out)) == 3


def test_infer_images_png_dynamic_range(salicon_root, srfnet_image_model, tmp_path):
    """The saliency PNGs are max-normalized to 0..255 (reference:
    utils_data.py:303). A sigmoid-scale map written raw through im2uint8
    would collapse to {0, 1} — every metric then scores near chance."""
    from iip_uavsal_saliency_tpu.runners.infer_images import test_images as run_imgs

    model, variables = srfnet_image_model
    out = str(tmp_path / "Saliency")
    run_imgs(salicon_root, out, model, variables, classes="val",
             iosize=IOSIZE, batch_size=2, method_name="M")
    pngs = sorted(os.listdir(os.path.join(out, "M")))
    assert len(pngs) == 3
    for f in pngs:
        img = cv2.imread(os.path.join(out, "M", f), -1)
        assert img.max() == 255, f  # max-normalized
        assert len(np.unique(img)) > 10, f  # full dynamic range, not binary


def test_is_image_stage_detects_frozen_and_plain(srfnet_image_model, uavsal_small):
    """The auto-route in Trainer/cli train must classify a variables tree
    identically whether it is a plain dict or a flax FrozenDict (a caller
    can legitimately hand over frozen variables never round-tripped
    through a checkpoint)."""
    import flax

    from iip_uavsal_saliency_tpu.models import is_image_stage_variables

    _, img_vars = srfnet_image_model
    _, vid_vars, _ = uavsal_small
    assert is_image_stage_variables(img_vars)
    assert is_image_stage_variables(flax.core.freeze(img_vars))
    assert not is_image_stage_variables(vid_vars)
    assert not is_image_stage_variables(flax.core.freeze(vid_vars))


def test_load_model_for_inference_rejects_s2d_on_zoo(tmp_path):
    """s2d_stem is flagship-only; a zoo variant must fail LOUDLY (before
    even touching the checkpoint), not silently serve the plain stem."""
    from iip_uavsal_saliency_tpu.runners.infer import load_model_for_inference

    with pytest.raises(NotImplementedError, match="s2d_stem"):
        load_model_for_inference(
            str(tmp_path / "none.ckpt"), model_name="uavsal_noob",
            s2d_stem=True,
        )
