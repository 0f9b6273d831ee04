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


# --------------------------------------------------------------------------- #
# Train-step parity: one forward + loss_fu + backward + Adam step executed by
# the reference's OWN torch code (loss_functions.py:43-50, the optimizer and
# freeze recipe of Demo_Train_Test.py:59-69,136-143) vs our step on converted
# weights.
#
# Precision design (measured on this host): jax's CPU f64 convolutions hit a
# non-vectorized fallback ~1000x slower than torch's (a 32x32 f64 forward
# alone is ~500 s), so f64-on-both-sides is not runnable. Instead the
# reference runs TWICE: in f64 (ground truth) and f32 (noise calibrator).
# This gradient is genuinely ill-conditioned in f32 — torch's OWN f32
# backward deviates 1-5% from its f64 backward on these tensors (BN backward
# and TBPTT through the recurrence amplify rounding) — so each gradient
# assertion is normalized by torch's own f32 deviation: ours must land within
# 4x that floor (measured <=2.6x; a semantic difference — wrong freeze mask,
# decay placement, gate wiring, loss masking — sits orders of magnitude
# above it). Well-conditioned quantities stay tight: the loss scalar, BN
# running-stat updates (pure forward quantities), frozen-params-stay-put
# (exact), and Adam updates on sign-stable entries (step 1 of Adam is
# -lr*sign(g) up to eps, so entries with |g| above the noise floor must
# agree to ~1e-7).


def _ref_train_step(ref, dtype, x, gauss, ob, y):
    """One reference train step (fwd + loss_fu + bwd + Adam) in `dtype`.

    Returns (loss, grads{torch name -> np}, sd0, sd1) with state_dicts
    captured before/after, as float64 numpy."""
    import loss_functions as ref_losses

    s_tr = x.shape[0]
    torch.manual_seed(3)  # same init for both dtypes (f32 init upcast is exact)
    tmodel = ref.UAVSal(
        cnn_type="mobilenet_v2", time_dims=5, num_stblock=2,
        bias_type=[1, 1, 1], iosize=[H, W, HO, WO], planes=256,
    ).to(dtype)
    tmodel.train()
    # reference fine-tune freeze (Demo_Train_Test.py:59-62)
    for p in tmodel.sfnet.parameters():
        p.requires_grad = False
    for p in tmodel.st_layer.parameters():
        p.requires_grad = False
    opt = torch.optim.Adam(
        [p for p in tmodel.parameters() if p.requires_grad],
        lr=1e-4, betas=(0.9, 0.999), weight_decay=5e-5,
    )
    sd0 = {k: v.detach().numpy().astype(np.float64).copy()
           for k, v in tmodel.state_dict().items()}

    cb = [
        torch.from_numpy(np.broadcast_to(gauss, (s_tr, 8, HO, WO)).copy()).to(dtype),
        torch.from_numpy(np.broadcast_to(ob, (s_tr, 20, HO, WO)).copy()).to(dtype),
    ]
    zero_state = [torch.zeros(1, 256, HO, WO, dtype=dtype)]
    t_out, _ = tmodel(torch.from_numpy(x).to(dtype), cb, zero_state)
    t_loss = ref_losses.loss_fu(t_out, torch.from_numpy(y).to(dtype))
    opt.zero_grad()
    t_loss.backward()
    grads = {
        "rnn.cell_list.0.rnn_conv.weight":
            tmodel.rnn.cell_list[0].rnn_conv.weight.grad,
        "conv_out_st.conv.0.0.weight":
            tmodel.conv_out_st.conv[0][0].weight.grad,
        "fust_layer.0.conv.2.weight": tmodel.fust_layer[0].conv[2].weight.grad,
        "fust_layer.0.conv.3.weight": tmodel.fust_layer[0].conv[3].weight.grad,
        "gauss_cb_layer.0.conv.1.0.weight":
            tmodel.gauss_cb_layer[0].conv[1][0].weight.grad,
        "fucbst_layer.0.conv.2.weight":
            tmodel.fucbst_layer[0].conv[2].weight.grad,
    }
    grads = {k: v.detach().numpy().astype(np.float64).copy()
             for k, v in grads.items()}
    opt.step()
    sd1 = {k: v.detach().numpy().astype(np.float64).copy()
           for k, v in tmodel.state_dict().items()}
    return float(t_loss.item()), grads, sd0, sd1


def test_train_step_matches_reference(ref):
    import optax

    from iip_uavsal_saliency_tpu.models import UAVSal
    from iip_uavsal_saliency_tpu.models.convert import convert_uavsal_state_dict
    from iip_uavsal_saliency_tpu.parallel.steps import create_train_state
    from iip_uavsal_saliency_tpu.training import losses as our_losses
    from iip_uavsal_saliency_tpu.training.optim import make_frozen_mask, make_optimizer

    S_TR = 10  # batch_size=2 x time_dims=5: exercises the cxt-tile quirk path
    rng = np.random.RandomState(7)
    x = rng.rand(S_TR, 3, H, W)
    gauss = rng.rand(8, HO, WO)
    ob = rng.rand(20, HO, WO)
    # y: blurred map in [0,1] + sparse binary fixation points, none empty
    ymap = rng.rand(S_TR, 1, HO, WO)
    ypts = (rng.rand(S_TR, 1, HO, WO) < 0.05).astype(np.float64)
    ypts[:, :, 3, 4] = 1.0  # ensure >=1 fixation per frame
    y = np.concatenate([ymap, ypts], axis=1)  # (S, 2, HO, WO)

    # ---- reference: f64 ground truth + f32 noise floor ----
    t_loss, t_grads, sd0, sd1 = _ref_train_step(ref, torch.float64, x, gauss, ob, y)
    t_loss32, t_grads32, _, sd1_32 = _ref_train_step(ref, torch.float32, x, gauss, ob, y)
    noise = {k: np.abs(t_grads32[k] - t_grads[k]).max() for k in t_grads}

    # ---- our step, f32 ----
    # ONE jitted graph produces loss, grads, and the mutated BN stats; the
    # Adam/weight-decay update is applied with the same optax chain
    # make_train_step uses (make_train_step itself is equivalence-tested in
    # test_sharding).
    variables = convert_uavsal_state_dict(sd0)
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables
    )
    model = UAVSal(time_dims=5)
    mask = make_frozen_mask(variables["params"], ("trunk/sfnet", "trunk/st_layer"))
    tx = make_optimizer(1e-4, 5e-5, trainable_mask=mask)
    state = create_train_state(variables, tx)

    jx = _to_jax_nhwc(x.astype(np.float32))[None]        # (1, S, H, W, 3)
    jy = _to_jax_nhwc(y.astype(np.float32))[None]        # (1, S, HO, WO, 2)
    jg = _to_jax_nhwc(gauss[None].astype(np.float32))[0]
    jo = _to_jax_nhwc(ob[None].astype(np.float32))[0]
    st0 = model.init_state(H, W, 1)

    def compute_loss(params):
        (out, _), mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jx, jg, jo, st0, train=True, mutable=["batch_stats"],
        )
        return our_losses.loss_fu(out[0], jy[0]), mutated["batch_stats"]

    (j_loss, new_bs), grads = jax.jit(
        jax.value_and_grad(compute_loss, has_aux=True)
    )(variables["params"])
    updates, _ = tx.update(grads, state.opt_state, variables["params"])
    new_params = optax.apply_updates(variables["params"], updates)

    # loss scalar: measured |ours-f64| ~1.1e-4 vs torch's own f32 ~2.9e-5
    loss_floor = max(8 * abs(t_loss32 - t_loss), 1e-5)
    assert abs(float(j_loss) - t_loss) <= loss_floor, (
        f"loss {float(j_loss):.8f} vs ref {t_loss:.8f} "
        f"(bound {loss_floor:.2e}, ref-f32 itself {t_loss32 - t_loss:+.2e})"
    )

    g_pairs = {
        "rnn.cell_list.0.rnn_conv.weight": grads["rnn"]["kernel"],
        "conv_out_st.conv.0.0.weight":
            grads["conv_out_st"]["expand"]["conv"]["kernel"],
        "fust_layer.0.conv.2.weight":
            grads["trunk"]["fust_layer"]["project"]["kernel"],
        "fust_layer.0.conv.3.weight":
            grads["trunk"]["fust_layer"]["project_bn"]["scale"],
        "gauss_cb_layer.0.conv.1.0.weight":
            grads["mp"]["gauss_cb_layer_0"]["dw"]["conv"]["kernel"],
        "fucbst_layer.0.conv.2.weight":
            grads["mp"]["fucbst_layer"]["project"]["kernel"],
    }
    for tname, jgrad in g_pairs.items():
        want = t_grads[tname]
        got = np.asarray(jgrad, np.float64)
        if got.ndim == 4:  # flax HWIO -> torch OIHW
            got = got.transpose(3, 2, 0, 1)
        dev = np.abs(got - want).max()
        bound = 4 * noise[tname] + 1e-7 * np.abs(want).max()
        assert dev <= bound, (
            f"grad {tname}: |ours-f64|={dev:.3e} > 4x torch-f32 noise "
            f"{noise[tname]:.3e}"
        )

    # post-step parameter UPDATES (new - old) on SIGN-STABLE entries: Adam's
    # first step is -lr*m^/(sqrt(v^)+eps) = -lr*sign(g) up to O(eps/|g|), so
    # wherever |g64| clears the f32 noise floor both sides must produce the
    # same +-lr update to ~1e-7. (Near-zero-gradient entries legitimately
    # flip sign under f32 rounding — excluded by construction, not ignored.)
    p1 = new_params
    upd_pairs = {
        "rnn.cell_list.0.rnn_conv.weight":
            (p1["rnn"]["kernel"], variables["params"]["rnn"]["kernel"]),
        "fust_layer.0.conv.2.weight":
            (p1["trunk"]["fust_layer"]["project"]["kernel"],
             variables["params"]["trunk"]["fust_layer"]["project"]["kernel"]),
        "fucbst_layer.0.conv.2.weight":
            (p1["mp"]["fucbst_layer"]["project"]["kernel"],
             variables["params"]["mp"]["fucbst_layer"]["project"]["kernel"]),
    }
    for tname, (new_p, old_p) in upd_pairs.items():
        want = sd1[tname] - sd0[tname]
        got = np.asarray(new_p, np.float64) - np.asarray(old_p, np.float64)
        if got.ndim == 4:
            got = got.transpose(3, 2, 0, 1)
        stable = np.abs(t_grads[tname]) > 8 * noise[tname]
        assert stable.sum() > stable.size // 20, f"too few stable entries {tname}"
        np.testing.assert_allclose(
            got[stable], want[stable], atol=1e-7, err_msg=f"update {tname}"
        )

    frozen_new = np.asarray(p1["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"])
    frozen_old = np.asarray(
        variables["params"]["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"]
    )
    assert np.array_equal(frozen_new, frozen_old), "frozen param moved"
    assert np.array_equal(
        sd1["sfnet.conv_last.0.weight"], sd0["sfnet.conv_last.0.weight"]
    )

    # train-mode BN running-stat updates: pure forward quantities, bounded
    # by torch's OWN f32-vs-f64 deviation on the same buffer (f32 activation
    # noise feeds the batch variance; measured ~3e-5 on deep-layer vars —
    # ours must land within 4x that floor). The unbiased-EMA Bessel factor
    # (~1.6e-3 on the running var at n=640) sits far above these bounds,
    # as does a wrong momentum.
    for (ours, tname) in [
        (new_bs["trunk"]["sfnet"]["features"]["features_0"]["bn"],
         "sfnet.features.features.0.1"),
        (new_bs["trunk"]["fust_layer"]["project_bn"], "fust_layer.0.conv.3"),
        (new_bs["mp"]["gauss_cb_layer_0"]["expand"]["bn"],
         "gauss_cb_layer.0.conv.0.1"),
        (new_bs["conv_out_st"]["dw"]["bn"], "conv_out_st.conv.1.1"),
    ]:
        for stat, key in (("mean", ".running_mean"), ("var", ".running_var")):
            want = sd1[tname + key]
            # torch's f32 calibrator itself varies run-to-run (MKL reduction
            # order), so keep an absolute floor of 5e-5 — still 30x below
            # the Bessel factor (~1.6e-3) and far below a wrong momentum,
            # the semantic errors this check exists to catch.
            floor = max(8 * np.abs(sd1_32[tname + key] - want).max(), 5e-5)
            np.testing.assert_allclose(
                np.asarray(ours[stat]), want,
                atol=floor, err_msg=f"bn {stat} {tname}",
            )


# --------------------------------------------------------------------------- #
# Ablation-zoo parity: every MODEL_ZOO variant forward-matched against the
# reference's own classes (model.py:582-1076) on converted weights.

S_ZOO = 10  # 2 groups x time_dims=5


def _zoo_inputs(seed=11):
    rng = np.random.RandomState(seed)
    x = rng.rand(S_ZOO, 3, H, W).astype(np.float32)
    gauss = rng.rand(8, HO, WO).astype(np.float32)
    ob = rng.rand(20, HO, WO).astype(np.float32)
    cb = [
        torch.from_numpy(np.broadcast_to(gauss, (S_ZOO, 8, HO, WO)).copy()),
        torch.from_numpy(np.broadcast_to(ob, (S_ZOO, 20, HO, WO)).copy()),
    ]
    return x, gauss, ob, cb


@pytest.mark.parametrize(
    "name,st_type",
    [
        ("uavsal_spconv", None),
        ("uavsal_teconv", None),
        ("uavsal_stblocks", None),
        ("uavsal_stblocks_type", "s2t"),
        ("uavsal_stblocks_type", "t2s"),
        ("uavsal_stblocks_type", "s_s2t"),
        ("uavsal_stc3d", None),
        ("uavsal_stc2_3d", None),
    ],
)
def test_zoo_stateless_matches_reference(ref, name, st_type):
    """Stateless zoo ablations: forward parity vs the reference classes
    (UAVSAL_SpCOnv :582, UAVSAL_teConv :622, UAVSAL_STBlocks :666,
    UAVSAL_STBlocks_type :708, UAVSAL_STC3D :760, UAVSAL_STC2_3D :802)."""
    from iip_uavsal_saliency_tpu.models.convert import convert_zoo_state_dict
    from iip_uavsal_saliency_tpu.models.uavsal import MODEL_ZOO

    ref_cls = {
        "uavsal_spconv": ref.UAVSAL_SpCOnv,
        "uavsal_teconv": ref.UAVSAL_teConv,
        "uavsal_stblocks": ref.UAVSAL_STBlocks,
        "uavsal_stblocks_type": ref.UAVSAL_STBlocks_type,
        "uavsal_stc3d": ref.UAVSAL_STC3D,
        "uavsal_stc2_3d": ref.UAVSAL_STC2_3D,
    }[name]
    tkw = dict(cnn_type="mobilenet_v2", num_stblock=2, planes=256)
    jkw = dict(cnn_type="mobilenet_v2", num_stblock=2, planes=256)
    if name != "uavsal_spconv":
        tkw["time_dims"] = jkw["time_dims"] = 5
    if st_type is not None:
        tkw["st_type"] = jkw["st_type"] = st_type

    torch.manual_seed(5)
    tmodel = ref_cls(**tkw)
    tmodel.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_zoo_state_dict(name, sd, st_type=st_type or "st")
    jmodel = MODEL_ZOO[name](**jkw)

    x, _, _, _ = _zoo_inputs()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x))
    if isinstance(t_out, tuple):  # UAVSAL_STBlocks returns (out, features)
        t_out, t_feat = t_out
    else:
        t_feat = None

    j_out = jax.jit(lambda v, x: jmodel.apply(v, x))(variables, _to_jax_nhwc(x))
    if isinstance(j_out, tuple):
        j_out, j_feat = j_out
    else:
        j_feat = None

    np.testing.assert_allclose(
        np.asarray(j_out)[..., 0], t_out.numpy()[:, 0], atol=2e-5
    )
    if t_feat is not None:
        assert j_feat is not None
        np.testing.assert_allclose(
            np.asarray(j_feat),
            np.moveaxis(t_feat.numpy(), 1, -1),
            atol=2e-4,
        )


def test_zoo_mp_matches_reference(ref):
    """UAVSAL_MP (reference: model.py:845-957): priors, no recurrence."""
    from iip_uavsal_saliency_tpu.models.convert import convert_zoo_state_dict
    from iip_uavsal_saliency_tpu.models.uavsal import UAVSalMP

    torch.manual_seed(6)
    tmodel = ref.UAVSAL_MP(
        cnn_type="mobilenet_v2", time_dims=5, num_stblock=2,
        bias_type=[1, 1, 1], planes=256,
    )
    tmodel.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_zoo_state_dict("uavsal_mp", sd)
    jmodel = UAVSalMP(time_dims=5)

    x, gauss, ob, cb = _zoo_inputs(12)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x), cb)
    j_out = jax.jit(lambda v, x, g, o: jmodel.apply(v, x, g, o))(
        variables, _to_jax_nhwc(x),
        _to_jax_nhwc(gauss[None])[0], _to_jax_nhwc(ob[None])[0],
    )
    np.testing.assert_allclose(
        np.asarray(j_out)[..., 0], t_out.numpy()[:, 0], atol=2e-5
    )


def test_zoo_lstm_matches_reference(ref):
    """UAVSAL_LSTM (reference: model.py:960-1076): ConvLSTM gate order
    (i,f,o,g — model_convlstm.py:117-121) and (h,c) carry across two clips."""
    from iip_uavsal_saliency_tpu.models.convert import convert_zoo_state_dict
    from iip_uavsal_saliency_tpu.models.uavsal import UAVSalLSTM

    torch.manual_seed(8)
    tmodel = ref.UAVSAL_LSTM(
        cnn_type="mobilenet_v2", time_dims=5, num_stblock=2,
        bias_type=[1, 1, 1], iosize=[H, W, HO, WO], planes=256,
    )
    tmodel.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_zoo_state_dict("uavsal_lstm", sd)
    jmodel = UAVSalLSTM(time_dims=5)

    x1, gauss, ob, cb = _zoo_inputs(13)
    x2 = np.random.RandomState(14).rand(S_ZOO, 3, H, W).astype(np.float32)
    zero = [(torch.zeros(1, 256, HO, WO), torch.zeros(1, 256, HO, WO))]
    with torch.no_grad():
        t_out1, t_st1 = tmodel(torch.from_numpy(x1), cb, zero)
        t_out2, t_st2 = tmodel(torch.from_numpy(x2), cb, [t_st1])

    apply = jax.jit(lambda v, x, g, o, st: jmodel.apply(v, x, g, o, st))
    jg = _to_jax_nhwc(gauss[None])[0]
    jo = _to_jax_nhwc(ob[None])[0]
    st0 = jmodel.init_state(H, W, 1)
    j_out1, j_st1 = apply(variables, _to_jax_nhwc(x1)[None], jg, jo, st0)
    j_out2, j_st2 = apply(variables, _to_jax_nhwc(x2)[None], jg, jo, j_st1)

    for t_out, j_out, t_st, j_st, tag in (
        (t_out1, j_out1, t_st1, j_st1, "clip1"),
        (t_out2, j_out2, t_st2, j_st2, "clip2"),
    ):
        np.testing.assert_allclose(
            np.asarray(j_out)[0, :, :, :, 0], t_out.numpy()[:, 0],
            atol=2e-5, err_msg=tag,
        )
        t_h, t_c = t_st[0].numpy(), t_st[1].numpy()
        got = np.asarray(j_st)  # (1, 2, HO, WO, C)
        np.testing.assert_allclose(
            got[0, 0], np.moveaxis(t_h[0], 0, -1), atol=2e-4, err_msg=tag + "/h"
        )
        np.testing.assert_allclose(
            got[0, 1], np.moveaxis(t_c[0], 0, -1), atol=2e-4, err_msg=tag + "/c"
        )


# --------------------------------------------------------------------------- #
# ResNet / VGG backbone parity: converters + pyramids vs the reference's
# ReResNet / ReVGG wrappers (model_feature.py:72-128) run on torchvision-layout
# modules (tests/tv_stub.py provides offline resnet18/50 + vgg16 builders with
# the exact state_dict layout).

@pytest.mark.parametrize("name_id", ["resnet18", "resnet50"])
def test_resnet_pyramid_matches_reference(ref, name_id):
    import model_feature as ref_feat

    from iip_uavsal_saliency_tpu.models.backbone import ResNetPyramid
    from iip_uavsal_saliency_tpu.models.convert import convert_resnet_backbone

    torch.manual_seed(17)
    tnet = ref_feat.ReResNet(name_id)
    tnet.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tnet.state_dict().items()}
    params, stats = convert_resnet_backbone(sd, name_id)

    rng = np.random.RandomState(18)
    x = rng.rand(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t_outs = tnet(torch.from_numpy(x))

    model = ResNetPyramid(name_id=name_id)
    j_outs = jax.jit(lambda v, x: model.apply(v, x))(
        {"params": params, "batch_stats": stats}, _to_jax_nhwc(x)
    )
    assert len(j_outs) == len(t_outs) == 5
    for i, (got, want) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(want.numpy(), 1, -1),
            atol=1e-4, err_msg=f"x{i}",
        )


def test_vgg_pyramid_matches_reference(ref):
    import model_feature as ref_feat

    from iip_uavsal_saliency_tpu.models.backbone import VGGPyramid
    from iip_uavsal_saliency_tpu.models.convert import convert_vgg16_backbone

    torch.manual_seed(19)
    tnet = ref_feat.ReVGG("vgg16")
    tnet.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tnet.state_dict().items()}
    params = convert_vgg16_backbone(sd)

    rng = np.random.RandomState(20)
    x = rng.rand(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t_outs = tnet(torch.from_numpy(x))

    model = VGGPyramid()
    j_outs = jax.jit(lambda v, x: model.apply(v, x))(
        {"params": params}, _to_jax_nhwc(x)
    )
    assert len(j_outs) == len(t_outs) == 5
    for i, (got, want) in enumerate(zip(j_outs, t_outs)):
        np.testing.assert_allclose(
            np.asarray(got), np.moveaxis(want.numpy(), 1, -1),
            atol=1e-4, err_msg=f"x{i + 1}",
        )


# --------------------------------------------------------------------------- #
# Cell-level parity for the two recurrent ablations no reference model class
# consumes (SURVEY M9): ConvSimGRU (model_convlstm.py:568-625) and
# ConvTWA_DW (model_convlstm.py:403-457), against the reference cells run
# step-by-step on converted weights.

C_CELL = 8
S_CELL = 4


def _cell_inputs(seed):
    rng = np.random.RandomState(seed)
    x = rng.randn(S_CELL, C_CELL, 10, 12).astype(np.float32) * 0.5
    h0 = rng.randn(1, C_CELL, 10, 12).astype(np.float32) * 0.5
    return x, h0


def test_simgru_cell_matches_reference(ref):
    import model_convlstm as ref_rnn

    from iip_uavsal_saliency_tpu.models.recurrent import ConvSimGRU

    torch.manual_seed(21)
    tcell = ref_rnn.ConvSimGRUCell(
        input_size=(10, 12), input_dim=C_CELL, hidden_dim=C_CELL,
        kernel_size=(3, 3), bias=False,
    )
    tcell.eval()
    x, h0 = _cell_inputs(22)
    with torch.no_grad():
        h = torch.from_numpy(h0)
        t_ys = []
        for t in range(S_CELL):
            h = tcell(torch.from_numpy(x[t : t + 1]), [h])
            t_ys.append(h.numpy())

    w = tcell.rnn_conv.weight.detach().numpy()  # (2C, 2C, 3, 3) OIHW
    variables = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    jcell = ConvSimGRU(hidden_dim=C_CELL)
    ys, h_last = jax.jit(lambda v, x, s: jcell.apply(v, x, s))(
        variables, _to_jax_nhwc(x), _to_jax_nhwc(h0)[0]
    )
    for t in range(S_CELL):
        np.testing.assert_allclose(
            np.asarray(ys[t]), np.moveaxis(t_ys[t][0], 0, -1),
            atol=2e-6, err_msg=f"t={t}",
        )
    np.testing.assert_allclose(
        np.asarray(h_last), np.moveaxis(t_ys[-1][0], 0, -1), atol=2e-6
    )


def test_twadw_cell_matches_reference(ref):
    import model_convlstm as ref_rnn

    from iip_uavsal_saliency_tpu.models.convert import _dwblock
    from iip_uavsal_saliency_tpu.models.recurrent import ConvTWADW

    torch.manual_seed(23)
    tcell = ref_rnn.ConvTWACell_DW(
        input_size=(10, 12), input_dim=C_CELL, hidden_dim=C_CELL,
        kernel_size=3, bias=False,
    )
    tcell.eval()
    x, h0 = _cell_inputs(24)
    with torch.no_grad():
        h = torch.from_numpy(h0)
        t_ys = []
        for t in range(S_CELL):
            h = tcell(torch.from_numpy(x[t : t + 1]), [h])
            t_ys.append(h.numpy())

    sd = {k: v.detach().numpy() for k, v in tcell.state_dict().items()}
    p, s = _dwblock(sd, "rnn_conv", expand=True)
    variables = {
        "params": {"cell": {"rnn_conv": p}},
        "batch_stats": {"cell": {"rnn_conv": s}},
    }
    jcell = ConvTWADW(hidden_dim=C_CELL)
    ys, h_last = jax.jit(lambda v, x, s: jcell.apply(v, x, s))(
        variables, _to_jax_nhwc(x), _to_jax_nhwc(h0)[0]
    )
    for t in range(S_CELL):
        np.testing.assert_allclose(
            np.asarray(ys[t]), np.moveaxis(t_ys[t][0], 0, -1),
            atol=2e-5, err_msg=f"t={t}",
        )
    np.testing.assert_allclose(
        np.asarray(h_last), np.moveaxis(t_ys[-1][0], 0, -1), atol=2e-5
    )
