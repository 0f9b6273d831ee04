"""Golden tests for core ops against independent NumPy/torch formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iip_uavsal_saliency_tpu.ops import (
    ConvBNAct,
    DWBlock,
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
)
from iip_uavsal_saliency_tpu.ops.initializers import _conv_fans, kaiming_normal, xavier_uniform
from iip_uavsal_saliency_tpu.ops.layers import relu6


def test_relu6():
    x = jnp.array([-3.0, 0.0, 2.5, 6.0, 9.0])
    np.testing.assert_allclose(relu6(x), [0.0, 0.0, 2.5, 6.0, 6.0])


def test_conv_fans_match_torch_semantics():
    # HWIO (3,3,16,32): torch OIHW (32,16,3,3): fan_in=16*9, fan_out=32*9
    fi, fo = _conv_fans((3, 3, 16, 32))
    assert (fi, fo) == (144.0, 288.0)
    # depthwise HWIO (3,3,1,64): torch (64,1,3,3): fan_in=9, fan_out=576
    fi, fo = _conv_fans((3, 3, 1, 64))
    assert (fi, fo) == (9.0, 576.0)


def test_kaiming_normal_stats():
    k = jax.random.PRNGKey(0)
    w = kaiming_normal(k, (3, 3, 64, 128), mode="fan_out")
    expected_std = np.sqrt(2.0 / (128 * 9))
    assert abs(float(w.std()) - expected_std) / expected_std < 0.05


def test_xavier_uniform_bounds():
    k = jax.random.PRNGKey(0)
    w = xavier_uniform(k, (3, 3, 512, 256))
    bound = np.sqrt(6.0 / (512 * 9 + 256 * 9))
    assert float(jnp.abs(w).max()) <= bound + 1e-7


def _torch_bilinear(x_nchw, out_h, out_w, align_corners):
    torch = pytest.importorskip("torch")
    t = torch.from_numpy(x_nchw)
    y = torch.nn.functional.interpolate(
        t, size=(out_h, out_w), mode="bilinear", align_corners=align_corners
    )
    return y.numpy()


@pytest.mark.parametrize("shape_out", [(45, 80), (23, 40), (90, 161)])
def test_resize_align_corners_matches_torch(shape_out):
    rng = np.random.RandomState(0)
    x = rng.rand(2, 7, 12, 20).astype(np.float32)  # NCHW for torch
    ref = _torch_bilinear(x, *shape_out, align_corners=True)
    got = resize_bilinear_align_corners(jnp.asarray(x.transpose(0, 2, 3, 1)), *shape_out)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)


def test_resize_half_pixel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    x = rng.rand(45, 80).astype(np.float32)
    ref = cv2.resize(x, (640, 360), interpolation=cv2.INTER_LINEAR)
    got = resize_bilinear_half_pixel(jnp.asarray(x), 360, 640)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_conv_bn_act_shapes_and_padding():
    m = ConvBNAct(16, kernel_size=3, dilation=6)
    x = jnp.ones((2, 12, 20, 8))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 12, 20, 16)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 6.0


def test_dwblock_residual_rules():
    x = jnp.ones((1, 8, 8, 32))
    # same in/out, stride 1 -> residual
    m = DWBlock(32)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 8, 8, 32)
    # stride 2 halves spatial
    m2 = DWBlock(64, stride=2)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(v2, x).shape == (1, 4, 4, 64)


def test_dwblock_matches_torch_reference_math():
    """Full numeric check of the inverted residual vs an independent torch impl."""
    torch = pytest.importorskip("torch")
    tnn = torch.nn

    rng = np.random.RandomState(42)
    inp, oup, k, dil = 8, 8, 3, 2
    hidden = inp * 6
    x = rng.randn(2, 6, 10, inp).astype(np.float32)

    m = DWBlock(oup, kernel_size=k, dilation=dil)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # build equivalent torch module in eval mode
    pad = dil * (k - 1) // 2
    t = tnn.Sequential(
        tnn.Conv2d(inp, hidden, 1, bias=False),
        tnn.BatchNorm2d(hidden),
        tnn.ReLU6(),
        tnn.Conv2d(hidden, hidden, k, padding=pad, dilation=dil, groups=hidden, bias=False),
        tnn.BatchNorm2d(hidden),
        tnn.ReLU6(),
        tnn.Conv2d(hidden, oup, 1, bias=False),
        tnn.BatchNorm2d(oup),
    ).eval()

    p = v["params"]
    with torch.no_grad():
        t[0].weight.copy_(torch.from_numpy(np.asarray(p["expand"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
        t[3].weight.copy_(torch.from_numpy(np.asarray(p["dw"]["conv"]["kernel"]).transpose(3, 2, 0, 1)))
        t[6].weight.copy_(torch.from_numpy(np.asarray(p["project"]["kernel"]).transpose(3, 2, 0, 1)))
        for bn_t, bn_name, parent in [(t[1], "bn", "expand"), (t[4], "bn", "dw")]:
            bn_t.weight.copy_(torch.from_numpy(np.asarray(p[parent][bn_name]["scale"])))
            bn_t.bias.copy_(torch.from_numpy(np.asarray(p[parent][bn_name]["bias"])))
        t[7].weight.copy_(torch.from_numpy(np.asarray(p["project_bn"]["scale"])))
        t[7].bias.copy_(torch.from_numpy(np.asarray(p["project_bn"]["bias"])))

        ref = x.transpose(0, 3, 1, 2)
        ref_t = torch.from_numpy(ref)
        out_ref = (ref_t + t(ref_t)).numpy()  # residual applies (inp==oup, s=1)

    got = np.asarray(m.apply(v, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, out_ref, rtol=1e-4, atol=1e-5)


def test_orthogonal_init_wide_and_tall():
    """orthogonal() must handle 'wide' kernels (prod(shape[:-1]) < out_ch,
    e.g. a 1x1 expand conv) via the transpose dance, and produce orthonormal
    columns/rows either way."""
    from iip_uavsal_saliency_tpu.ops.initializers import orthogonal

    key = jax.random.PRNGKey(0)
    tall = orthogonal(key, (3, 3, 3, 16))       # 27 x 16
    q = np.asarray(tall).reshape(27, 16)
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)

    wide = orthogonal(key, (1, 1, 16, 64))      # 16 x 64: crashed before
    q = np.asarray(wide).reshape(16, 64)
    np.testing.assert_allclose(q @ q.T, np.eye(16), atol=1e-5)


def test_dilated_dw_pad_add_exact_and_gated():
    """The large-dilation depthwise path (dw_dilated_3x3_pad_add) must be
    bit-level-exact vs the conv op at the real ASPP shapes, keep the
    variable tree identical across gated/ungated shapes, match nn.Conv's
    dtype promotion, and have matching gradients."""
    from jax import lax

    from iip_uavsal_saliency_tpu.ops.layers import dw_dilated_3x3_pad_add

    rng = np.random.RandomState(0)
    c = 16

    def conv_ref(x, k, d):
        return lax.conv_general_dilated(
            x, k, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
            feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # exactness at the two flagship c5 grids + an all-taps-dead dilation
    k = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32))
    for h, w, d in [(23, 40, 18), (18, 32, 18), (7, 9, 30)]:
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        np.testing.assert_allclose(
            dw_dilated_3x3_pad_add(x, k, d), conv_ref(x, k, d),
            rtol=1e-5, atol=1e-5)

    # the module takes the gated path at 23x40 d=18 and equals conv+bn+relu6
    mod = ConvBNAct(c, 3, dilation=18, groups=c)
    x = jnp.asarray(rng.randn(2, 23, 40, c).astype(np.float32))
    vs = mod.init(jax.random.PRNGKey(0), x)
    kk = vs["params"]["conv"]["kernel"]
    bn, st = vs["params"]["bn"], vs["batch_stats"]["bn"]
    ref = conv_ref(x, kk, 18)
    ref = (ref - st["mean"]) / jnp.sqrt(st["var"] + 1e-5) * bn["scale"] + bn["bias"]
    np.testing.assert_allclose(
        mod.apply(vs, x), jnp.clip(ref, 0, 6), rtol=1e-5, atol=1e-5)

    # same variable tree whether or not the gate fires (64x64 -> conv path)
    vs_big = ConvBNAct(c, 3, dilation=18, groups=c).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, c)))
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vs_big)

    # bf16 input + f32 params promotes to f32, like nn.Conv
    assert mod.apply(vs, x.astype(jnp.bfloat16)).dtype == jnp.float32

    # gradients of the two forms agree
    g1 = jax.grad(lambda kk_: (conv_ref(x, kk_, 18) ** 2).sum())(kk)
    g2 = jax.grad(lambda kk_: (dw_dilated_3x3_pad_add(x, kk_, 18) ** 2).sum())(kk)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-3)
