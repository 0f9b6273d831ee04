"""Golden full-model parity vs the reference's OWN implementation.

These tests import `/root/reference/model.py` (PyTorch), build reference
models randomly initialized on CPU, move the weights through our converters
(models/convert.py), and assert that forward outputs agree numerically.
Unlike the component tests (which compare against torch *restatements* in the
tests themselves), any systematic graph-level deviation — BN ordering, padding
off-by-one, resize edge case, backbone stage cut — fails here.

Reference specifics handled:
- torchvision is absent: tests/tv_stub.py provides a torchvision-layout
  MobileNetV2 (reference: model_feature.py:4-10 imports, :59 pretrained load);
- `init_hidden` hardcodes `.cuda()` (reference: model_convlstm.py:295): we
  always pass an explicit zero state, and patch Tensor.cuda as a backstop.
"""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import tv_stub

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

REF_DIR = "/root/reference"
H, W, HO, WO = 64, 64, 8, 8
S = 5  # one clip: batch_size=1 x time_dims=5


@pytest.fixture(scope="module")
def ref():
    """Import the reference package with the torchvision stub installed."""
    tv_stub.install()
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only environment
    import model as ref_model

    yield ref_model
    torch.Tensor.cuda = orig_cuda


def _to_jax_nhwc(x_nchw):
    return jnp.asarray(np.ascontiguousarray(np.moveaxis(x_nchw, 1, -1)))


@pytest.fixture(scope="module")
def parity_pair(ref):
    """(reference torch UAVSal, our UAVSal + converted variables)."""
    from iip_uavsal_saliency_tpu.models import UAVSal
    from iip_uavsal_saliency_tpu.models.convert import convert_uavsal_state_dict

    torch.manual_seed(0)
    tmodel = ref.UAVSal(
        cnn_type="mobilenet_v2",
        time_dims=5,
        num_stblock=2,
        bias_type=[1, 1, 1],
        iosize=[H, W, HO, WO],
        planes=256,
    )
    tmodel.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_uavsal_state_dict(sd)
    jmodel = UAVSal(time_dims=5)
    return tmodel, jmodel, variables


def test_uavsal_forward_matches_reference(parity_pair):
    """Eval-mode forward on 2 consecutive clips: saliency AND carried state
    agree with /root/reference/model.py:341-375 run on the same weights."""
    tmodel, jmodel, variables = parity_pair
    rng = np.random.RandomState(1)
    x1 = rng.rand(S, 3, H, W).astype(np.float32)
    x2 = rng.rand(S, 3, H, W).astype(np.float32)
    gauss = rng.rand(8, HO, WO).astype(np.float32)
    ob = rng.rand(20, HO, WO).astype(np.float32)

    cb = [
        torch.from_numpy(np.broadcast_to(gauss, (S, 8, HO, WO)).copy()),
        torch.from_numpy(np.broadcast_to(ob, (S, 20, HO, WO)).copy()),
    ]
    zero_state = [torch.zeros(1, 256, HO, WO)]
    with torch.no_grad():
        t_out1, t_state1 = tmodel(torch.from_numpy(x1), cb, zero_state)
        t_out2, t_state2 = tmodel(torch.from_numpy(x2), cb, [t_state1[0]])

    apply = jax.jit(
        lambda v, x, g, o, st: jmodel.apply(v, x, g, o, st)
    )
    jg = _to_jax_nhwc(gauss[None])[0]  # (HO, WO, 8)
    jo = _to_jax_nhwc(ob[None])[0]     # (HO, WO, 20)
    st0 = jmodel.init_state(H, W, 1)
    j_out1, j_st1 = apply(variables, _to_jax_nhwc(x1)[None], jg, jo, st0)
    j_out2, j_st2 = apply(variables, _to_jax_nhwc(x2)[None], jg, jo, j_st1)

    for t_out, j_out, t_st, j_st, tag in (
        (t_out1, j_out1, t_state1, j_st1, "clip1"),
        (t_out2, j_out2, t_state2, j_st2, "clip2"),
    ):
        ref_sal = t_out.numpy()[:, 0]                 # (S, HO, WO)
        got_sal = np.asarray(j_out)[0, :, :, :, 0]     # (S, HO, WO)
        np.testing.assert_allclose(got_sal, ref_sal, atol=2e-5, err_msg=tag)
        ref_h = np.moveaxis(t_st[0].numpy(), 1, -1)    # (1, HO, WO, 256)
        got_h = np.asarray(j_st)
        np.testing.assert_allclose(got_h, ref_h, atol=2e-4, err_msg=tag + "/state")


def test_mobilenet_v2_pyramid_matches_torchvision_layout(ref):
    """Backbone converter against a torchvision-layout MobileNetV2 module:
    all 5 pyramid stages match the reference's feature slicing
    (reference: model_feature.py:63-68 — features [0:2][2:4][4:7][7:14][14:18])."""
    from iip_uavsal_saliency_tpu.models.backbone import MobileNetV2Pyramid
    from iip_uavsal_saliency_tpu.models.convert import convert_mobilenet_v2_backbone

    torch.manual_seed(1)
    tnet = tv_stub.mobilenet_v2(pretrained=True)
    tnet.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_mobilenet_v2_backbone(sd)

    rng = np.random.RandomState(2)
    x = rng.rand(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        tx = torch.from_numpy(x)
        c1 = tnet.features[0:2](tx)
        c2 = tnet.features[2:4](c1)
        c3 = tnet.features[4:7](c2)
        c4 = tnet.features[7:14](c3)
        c5 = tnet.features[14:18](c4)

    model = MobileNetV2Pyramid()
    outs = jax.jit(
        lambda v, x: model.apply(v, x)
    )({"params": params, "batch_stats": stats}, _to_jax_nhwc(x))
    for got, want, tag in zip(outs, (c1, c2, c3, c4, c5), "c1 c2 c3 c4 c5".split()):
        np.testing.assert_allclose(
            np.asarray(got),
            np.moveaxis(want.numpy(), 1, -1),
            atol=1e-4,
            err_msg=tag,
        )
