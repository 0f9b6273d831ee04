"""Model graph tests: shapes, statefulness, param budget, vectorized temporal diffs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iip_uavsal_saliency_tpu.models import UAVSal, build_model, init_variables
from iip_uavsal_saliency_tpu.models.recurrent import ConvLSTM, ConvSimGRU, ConvTWA
from iip_uavsal_saliency_tpu.models.stblock import temporal_differences
from iip_uavsal_saliency_tpu.ops.stats import param_bytes, param_count

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

# Small input keeps CPU compile times manageable; strides still exercise
# every stage (H, W must be multiples of 32 for clean pyramids).
H, W = 64, 128
HO, WO = H // 8, W // 8
T = 5


def _make_model_and_vars(seq=T, n_videos=1, **kw):
    model = UAVSal(time_dims=T, **kw)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n_videos, seq, H, W, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32))
    s = model.init_state(H, W, n_videos)
    vars_ = init_variables(model, jax.random.PRNGKey(0), x, g, o, s)
    return model, vars_, (x, g, o, s)


def test_temporal_differences_matches_reference_loop():
    """Vectorized diffs == the reference's per-frame loop (model.py:194-198)."""
    rng = np.random.RandomState(0)
    x = rng.randn(7, 3, 4, 2).astype(np.float32)

    # reference loop, translated to numpy channel-last
    subs = [np.concatenate([x[1] - x[0], x[0] - x[1]], -1)]
    for i in range(1, 6):
        subs.append(np.concatenate([x[i] - x[i - 1], x[i] - x[i + 1]], -1))
    subs.append(np.concatenate([x[6] - x[5], x[5] - x[6]], -1))
    ref = np.stack(subs, 0)

    got = np.asarray(temporal_differences(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_temporal_differences_per_clip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(10, 2, 2, 1).astype(np.float32))
    per_clip = np.asarray(temporal_differences(x, group=5))
    ref0 = np.asarray(temporal_differences(x[:5]))
    ref1 = np.asarray(temporal_differences(x[5:]))
    np.testing.assert_allclose(per_clip, np.concatenate([ref0, ref1], 0), rtol=1e-6)


def test_conv_twa_matches_naive_loop():
    """Split-gate scan == naive concat-conv recurrence."""
    rng = np.random.RandomState(2)
    cin = ch = 8
    cell = ConvTWA(hidden_dim=ch)
    x = jnp.asarray(rng.randn(4, 6, 6, cin).astype(np.float32))
    h0 = jnp.zeros((6, 6, ch))
    v = cell.init(jax.random.PRNGKey(0), x, h0)
    ys, h_last = cell.apply(v, x, h0)

    # naive: conv(concat([x_t, h]), W) per step
    from jax import lax

    k = np.asarray(v["params"]["kernel"])
    h = np.zeros((6, 6, ch), np.float32)
    outs = []
    for t in range(4):
        comb = np.concatenate([np.asarray(x[t]), h], -1)[None]
        z = lax.conv_general_dilated(
            jnp.asarray(comb), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        gate = np.asarray(jax.nn.sigmoid(z))[0]
        h = gate * np.asarray(x[t]) + (1 - gate) * h
        outs.append(h)
    np.testing.assert_allclose(np.asarray(ys), np.stack(outs), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), outs[-1], rtol=1e-4, atol=1e-5)


def test_conv_twa_state_carry_changes_output():
    cell = ConvTWA(hidden_dim=4)
    x = jnp.ones((3, 4, 4, 4))
    h0 = jnp.zeros((4, 4, 4))
    v = cell.init(jax.random.PRNGKey(0), x, h0)
    y0, s0 = cell.apply(v, x, h0)
    y1, s1 = cell.apply(v, x, s0)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_conv_lstm_and_gru_shapes():
    for cell, state_shape in [
        (ConvLSTM(hidden_dim=4), (2, 4, 4, 4)),
        (ConvSimGRU(hidden_dim=4), (4, 4, 4)),
    ]:
        x = jnp.ones((3, 4, 4, 4))
        s = jnp.zeros(state_shape)
        v = cell.init(jax.random.PRNGKey(0), x, s)
        y, s2 = cell.apply(v, x, s)
        assert y.shape == (3, 4, 4, 4)
        assert s2.shape == state_shape


def test_uavsal_forward_shapes_and_state(uavsal_small):
    model, vars_, (x, g, o, s) = uavsal_small
    y, s2 = model.apply(vars_, x, g, o, s)
    assert y.shape == (1, T, HO, WO, 1)
    assert s2.shape == s.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # stateful: second clip differs from replay of first
    y2, _ = model.apply(vars_, x, g, o, s2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_uavsal_multivideo_matches_per_video():
    """V>1 (eval mode) must equal running each video independently."""
    model, vars_, (x, g, o, s) = _make_model_and_vars(n_videos=3)
    y, s2 = model.apply(vars_, x, g, o, s)
    assert y.shape == (3, T, HO, WO, 1)
    for vid in range(3):
        yi, si = model.apply(vars_, x[vid : vid + 1], g, o, s[vid : vid + 1])
        np.testing.assert_allclose(np.asarray(y[vid]), np.asarray(yi[0]), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(s2[vid]), np.asarray(si[0]), rtol=2e-4, atol=2e-5)


def test_s2d_stem_module_exact():
    """ops.layers.S2DStem is an EXACT reparametrization of the plain
    3x3-stride-2 stem: identical variable tree, same output to f32
    rounding, in eval AND train mode (same BN batch statistics)."""
    from iip_uavsal_saliency_tpu.ops.layers import ConvBNAct, S2DStem

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
    plain = ConvBNAct(32, kernel_size=3, stride=2)
    s2d = S2DStem(32)
    v = plain.init(jax.random.PRNGKey(0), x)
    v2 = s2d.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for train in (False, True):
        kw = {"mutable": ["batch_stats"]} if train else {}
        ya = plain.apply(v, x, train, **kw)
        yb = s2d.apply(v, x, train, **kw)
        if train:
            (ya, ma), (yb, mb) = ya, yb
            np.testing.assert_allclose(
                np.asarray(ma["batch_stats"]["bn"]["var"]),
                np.asarray(mb["batch_stats"]["bn"]["var"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5)


def test_s2d_stem_model_parity(uavsal_small):
    """UAVSal(s2d_stem=True) on the SAME variables == the plain model."""
    model, vars_, (x, g, o, s) = uavsal_small
    y, s2 = model.apply(vars_, x, g, o, s)
    m2 = UAVSal(time_dims=T, s2d_stem=True)
    y2, s22 = m2.apply(vars_, x, g, o, s)
    # atol 1e-4: the stem conv's different contraction order perturbs the
    # f32 output by ~1 ulp, which ~30 downstream layers amplify slightly
    # (module-level exactness is pinned at 1e-5 by test_s2d_stem_module_exact)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s22),
                               rtol=2e-4, atol=1e-4)


def test_uavsal_param_budget(uavsal_small):
    """Reference UAVSal = 51.59 MB of fp32 params+buffers
    (reference: Tools/Getmodelsize_demo.py:93). BN running stats live in
    batch_stats here; params+batch_stats should land within ~2%."""
    model, vars_, _ = uavsal_small
    total = param_bytes(vars_["params"]) + param_bytes(vars_["batch_stats"])
    mb = total / 1024 / 1024
    assert 50.0 < mb < 53.0, f"param budget {mb:.2f} MB"


def test_uavsal_bias_type_variants():
    for bias_type in [(0, 0, 0), (1, 0, 0), (0, 1, 1)]:
        model, vars_, (x, g, o, s) = _make_model_and_vars(bias_type=bias_type)
        y, _ = model.apply(vars_, x, g, o, s)
        assert y.shape == (1, T, HO, WO, 1)


@pytest.mark.parametrize(
    "name,needs_priors,needs_state,extra",
    [
        ("uavsal_spconv", False, False, {}),
        ("uavsal_teconv", False, False, {}),
        ("uavsal_stblocks", False, False, {}),
        ("uavsal_stblocks_type", False, False, {"st_type": "s2t"}),
        ("uavsal_stc3d", False, False, {}),
        ("uavsal_stc2_3d", False, False, {}),
        ("uavsal_mp", True, False, {}),
        ("uavsal_lstm", True, True, {}),
    ],
)
def test_ablation_zoo_forward(name, needs_priors, needs_state, extra):
    kw = dict(extra)
    if name != "uavsal_spconv":
        kw["time_dims"] = T
    model = build_model(name, **kw)
    x = jnp.zeros((T, H, W, 3))
    args = [x]
    if needs_priors:
        args += [jnp.zeros((HO, WO, 8)), jnp.zeros((HO, WO, 20))]
    if needs_state:
        args[0] = x[None]  # stateful models take (V, S, H, W, 3)
        args += [model.init_state(H, W, 1)]
    vars_ = init_variables(model, jax.random.PRNGKey(0), *args)
    out = model.apply(vars_, *args)
    y = out[0] if isinstance(out, tuple) else out
    expected = (1, T, HO, WO, 1) if needs_state else (T, HO, WO, 1)
    assert y.shape == expected


def _naive_gate_conv(x_t, h_prev, k):
    from jax import lax

    comb = np.concatenate([np.asarray(x_t), np.asarray(h_prev)], -1)[None]
    z = lax.conv_general_dilated(
        jnp.asarray(comb), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return np.asarray(z)[0]


def test_conv_lstm_matches_naive_loop():
    """Split-gate LSTM scan == naive 4-gate concat-conv recurrence
    (reference formulas: model_convlstm.py:96-112)."""
    rng = np.random.RandomState(3)
    ch = 6
    cell = ConvLSTM(hidden_dim=ch)
    x = jnp.asarray(rng.randn(4, 5, 5, ch).astype(np.float32) * 0.5)
    s0 = jnp.zeros((2, 5, 5, ch))
    v = cell.init(jax.random.PRNGKey(0), x, s0)
    ys, s_last = cell.apply(v, x, s0)

    k = np.asarray(v["params"]["kernel"])
    h = np.zeros((5, 5, ch), np.float32)
    c = np.zeros((5, 5, ch), np.float32)
    outs = []
    for t in range(4):
        z = _naive_gate_conv(x[t], h, k)
        ci, cf, co, cg = np.split(z, 4, axis=-1)
        sig = lambda a: 1 / (1 + np.exp(-a))
        i, f, o, g = sig(ci), sig(cf), sig(co), np.tanh(cg)
        c = f * c + i * g
        h = o * np.tanh(c)
        outs.append(h)
    np.testing.assert_allclose(np.asarray(ys), np.stack(outs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_last[0]), outs[-1], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_last[1]), c, rtol=2e-4, atol=2e-5)


def test_conv_simgru_matches_naive_loop():
    """2-gate SimGRU scan == naive recurrence
    (reference formulas: model_convlstm.py:589-600)."""
    rng = np.random.RandomState(4)
    ch = 6
    cell = ConvSimGRU(hidden_dim=ch)
    x = jnp.asarray(rng.randn(3, 4, 4, ch).astype(np.float32) * 0.5)
    s0 = jnp.zeros((4, 4, ch))
    v = cell.init(jax.random.PRNGKey(0), x, s0)
    ys, s_last = cell.apply(v, x, s0)

    k = np.asarray(v["params"]["kernel"])
    h = np.zeros((4, 4, ch), np.float32)
    outs = []
    for t in range(3):
        z = _naive_gate_conv(x[t], h, k)
        ci, cg = np.split(z, 2, axis=-1)
        i = 1 / (1 + np.exp(-ci))
        g = np.tanh(cg)
        h = i * g + (1 - i) * h
        outs.append(h)
    np.testing.assert_allclose(np.asarray(ys), np.stack(outs), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_last), outs[-1], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("name,kwargs", [
    ("uavsal_teconv", {}),
    # MP: compat_cxt_tile=False so the V=1 runs use the same group-major
    # context tiling the adapter forces at V>1 (the t-major reference quirk
    # is single-video-only by design, see UAVSal.__call__); what this test
    # isolates is the trunk's temporal-difference bounding.
    ("uavsal_mp", dict(bias_type=(1, 1, 1), compat_cxt_tile=False)),
])
def test_zoo_adapter_no_cross_video_leak(name, kwargs):
    """ZooModelAdapter with V>1 must bound temporal differences per video:
    the (V, S) batch's output must equal each video run alone (for a single
    whole video, the reference's whole-batch diff == the per-video bound, so
    V=1 semantics are unchanged). Without diff_group, frame V0[S-1] would
    difference against V1[0] across the video boundary."""
    from iip_uavsal_saliency_tpu.models.adapters import build_adapted_model

    model = build_adapted_model(name, time_dims=2, num_stblock=1, **kwargs)
    rng = np.random.RandomState(0)
    h = w = 32
    x = jnp.asarray(rng.rand(2, 4, h, w, 3).astype(np.float32))
    gauss = ob = None
    if name == "uavsal_mp":
        gauss = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
        ob = jnp.asarray(rng.rand(h // 8, w // 8, 20).astype(np.float32))
    st = model.init_state(h, w, 2)
    variables = model.init(jax.random.PRNGKey(0), x, gauss, ob, st)

    (out2, _) = model.apply(variables, x, gauss, ob, st)
    for v in range(2):
        (out1, _) = model.apply(
            variables, x[v : v + 1], gauss, ob, model.init_state(h, w, 1)
        )
        np.testing.assert_allclose(
            np.asarray(out2[v]), np.asarray(out1[0]), atol=1e-5,
            err_msg=f"video {v} differs when batched — cross-video leak",
        )


import flax.linen as _nn


class _NaiveMultiPriors(_nn.Module):
    """Pre-hoist MultiPriors forward: every prior stream broadcast to the
    full S frames BEFORE the fucb conv (the reference's per-frame layout,
    model.py:346-365). Same submodule names as MultiPriors, so one set of
    variables drives both — the production module's eval-mode fucb hoist
    (compute G distinct rows, tile after) must match this exactly."""

    planes: int = 256
    time_dims: int = 5
    bias_type: tuple = (1, 1, 1)
    compat_cxt_tile: bool = True

    @_nn.compact
    def __call__(self, x, gauss_prior, ob_prior, train: bool = False):
        from iip_uavsal_saliency_tpu.models.uavsal import CB_OUPLANES
        from iip_uavsal_saliency_tpu.ops.layers import DWBlock
        from iip_uavsal_saliency_tpu.ops.resize import resize_bilinear_align_corners

        use_gauss, use_ob, use_cxt = [bool(b) for b in self.bias_type]
        s, ho, wo, c = x.shape
        cb_fu = []

        def _stream(prior):
            p = prior[None]
            return jnp.broadcast_to(p, (s,) + prior.shape) if train else p

        if use_gauss:
            g = _stream(gauss_prior)
            g = DWBlock(CB_OUPLANES[0], 3, name="gauss_cb_layer_0")(g, train)
            g = DWBlock(CB_OUPLANES[0], 3, name="gauss_cb_layer_1")(g, train)
            cb_fu.append(jnp.broadcast_to(g, (s, ho, wo, CB_OUPLANES[0])))
        if use_ob:
            o = _stream(ob_prior)
            o = DWBlock(CB_OUPLANES[1], 3, name="ob_cb_layer_0")(o, train)
            o = DWBlock(CB_OUPLANES[1], 3, name="ob_cb_layer_1")(o, train)
            cb_fu.append(jnp.broadcast_to(o, (s, ho, wo, CB_OUPLANES[1])))
        if use_cxt:
            t = self.time_dims
            x_cb = x.reshape(s // t, t, ho, wo, c).sum(axis=1)
            cxt = DWBlock(CB_OUPLANES[2], 3, stride=2, name="cxt_cb_prior_0")(x_cb, train)
            cxt = DWBlock(CB_OUPLANES[2], 3, stride=2, name="cxt_cb_prior_1")(cxt, train)
            cxt = resize_bilinear_align_corners(cxt, ho, wo)
            if self.compat_cxt_tile:
                cxt = jnp.tile(cxt, (t, 1, 1, 1))
            else:
                cxt = jnp.repeat(cxt, t, axis=0)
            cb_fu.append(cxt)

        cb = jnp.concatenate(cb_fu, axis=-1)
        x_cb = DWBlock(self.planes // 4, 3, name="fucb_layer")(cb, train)
        return DWBlock(self.planes, 3, name="fucbst_layer")(
            jnp.concatenate([x, x_cb], axis=-1), train
        )


@pytest.mark.parametrize("bias_type,compat", [
    ((1, 1, 1), True),   # flagship: t-major context tile
    ((1, 1, 1), False),  # group-major tile
    ((1, 0, 1), True),   # the pipeline default (no observed priors)
    ((1, 1, 0), False),  # no context: fucb input is fully clip-constant
    ((0, 0, 1), True),   # context only
])
def test_multipriors_fucb_hoist_exact(bias_type, compat):
    """Eval-mode fucb hoist (run the prior-fusion conv on the G distinct
    window rows, tile after) == the naive full-S forward, exactly: eval BN
    is pointwise, so conv-then-tile commutes with tile-then-conv. Train
    mode must also agree (both run the reference's full-S batch there)."""
    from iip_uavsal_saliency_tpu.models.uavsal import MultiPriors

    t, groups = 5, 3
    s, ho, wo, c = t * groups, 8, 16, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(s, ho, wo, c).astype(np.float32))
    g = jnp.asarray(rng.rand(ho, wo, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(ho, wo, 20).astype(np.float32))

    kw = dict(planes=c, time_dims=t, bias_type=bias_type, compat_cxt_tile=compat)
    naive = _NaiveMultiPriors(**kw)
    hoisted = MultiPriors(**kw)
    variables = jax.jit(naive.init)(jax.random.PRNGKey(0), x, g, o)

    want = naive.apply(variables, x, g, o)
    got = hoisted.apply(variables, x, g, o)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    for mod in (naive, hoisted):  # train mode: same path, same BN stat updates
        out, mut = mod.apply(variables, x, g, o, True, mutable=["batch_stats"])
        if mod is naive:
            want_out, want_mut = out, mut
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        mut, want_mut,
    )
