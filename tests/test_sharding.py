"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
from iip_uavsal_saliency_tpu.parallel import (
    TrainState,
    create_train_state,
    data_sharding,
    make_eval_step,
    make_infer_step,
    make_mesh,
    make_train_step,
    replicated,
)
from iip_uavsal_saliency_tpu.training import make_optimizer, make_frozen_mask

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

H, W, T = 64, 64, 5
HO, WO = H // 8, W // 8


def _setup(v):
    model = UAVSal(time_dims=T)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(v, T, H, W, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32))
    s = model.init_state(H, W, v)
    y = jnp.asarray((rng.rand(v, T, HO, WO, 2) > 0.7).astype(np.float32))
    variables = init_variables(model, jax.random.PRNGKey(0), x, g, o, s)
    return model, variables, (x, g, o, s, y)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert dict(mesh.shape) == {"data": 4, "spatial": 2, "seq": 1, "model": 1}
    mesh4 = make_mesh(n_data=2, n_spatial=1, n_seq=2, n_model=2)
    assert dict(mesh4.shape) == {"data": 2, "spatial": 1, "seq": 2, "model": 2}


def test_train_step_dp_matches_single_device():
    """Gradient all-reduce over 'data' must give the same result as the
    unsharded step."""
    model, variables, (x, g, o, s, y) = _setup(v=4)
    tx = make_optimizer(1e-3, 0.0)

    # single-device baseline
    st0 = create_train_state(variables, tx)
    step0 = make_train_step(model, tx, donate=False)
    st0b, loss0, rnn0 = step0(st0, x, g, o, s, y)

    # 4-way dp mesh
    mesh = make_mesh(n_data=4, n_spatial=1)
    st1 = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    step1 = make_train_step(model, tx, mesh=mesh, donate=False)
    st1b, loss1, rnn1 = step1(
        st1,
        jax.device_put(x, data_sharding(mesh, 5)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(s, data_sharding(mesh, 4)),
        jax.device_put(y, data_sharding(mesh, 5)),
    )
    # sharded reductions reorder float adds; through ~50 BN layers and a
    # 5-step scan the drift stays small but nonzero
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rnn0), np.asarray(rnn1), atol=0.03)
    # parameters after update: Adam's first step is ~ -lr*sign(grad), so a
    # near-zero gradient can flip sign under reduction reordering — require
    # 98% of elements to agree instead of exact closeness
    p0 = np.asarray(jax.tree_util.tree_leaves(st0b.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(st1b.params)[0])
    agree = np.mean(np.abs(p0 - p1) < 5e-4)
    assert agree > 0.98, f"only {agree:.3f} of params agree"


def test_train_step_dp_sp_runs():
    """dp x sp mesh (2x4): rows sharded, conv halos inserted by XLA."""
    model, variables, (x, g, o, s, y) = _setup(v=2)
    tx = make_optimizer(1e-3, 5e-5)
    mesh = make_mesh(n_data=2, n_spatial=4)
    st = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    _, loss, _ = step(
        st,
        jax.device_put(x, data_sharding(mesh, 5, spatial_axis=2)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(s, data_sharding(mesh, 4, spatial_axis=1)),
        jax.device_put(y, data_sharding(mesh, 5, spatial_axis=2)),
    )
    assert np.isfinite(float(loss))


def test_eval_and_infer_steps():
    model, variables, (x, g, o, s, y) = _setup(v=2)
    mesh = make_mesh(n_data=2, n_spatial=1)
    ev = make_eval_step(model, mesh=mesh)
    loss, rnn = ev(variables["params"], variables["batch_stats"], x, g, o, s, y)
    assert np.isfinite(float(loss))

    inf = make_infer_step(model, mesh=mesh)
    x_u8 = (np.asarray(x) * 255).astype(np.uint8)
    out, rnn2 = inf(variables["params"], variables["batch_stats"], jnp.asarray(x_u8), g, o, s)
    assert out.shape == (2, T, HO, WO, 1)


def test_frozen_mask_freezes_sfnet_and_st_layer():
    """Fine-tuning freeze parity (reference: Demo_Train_Test.py:59-62)."""
    model, variables, (x, g, o, s, y) = _setup(v=1)
    mask = make_frozen_mask(variables["params"], ("trunk/sfnet", "trunk/st_layer"))
    tx = make_optimizer(1e-2, 0.0, trainable_mask=mask)
    st = create_train_state(variables, tx)
    step = make_train_step(model, tx, donate=False)
    st2, loss, _ = step(st, x, g, o, s, y)
    frozen_before = variables["params"]["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"]
    frozen_after = st2.params["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(frozen_before), np.asarray(frozen_after))
    live_before = variables["params"]["conv_out_st"]["dw"]["conv"]["kernel"]
    live_after = st2.params["conv_out_st"]["dw"]["conv"]["kernel"]
    assert not np.allclose(np.asarray(live_before), np.asarray(live_after))


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # compile-only check on tiny virtual CPU devices would be too slow at
    # 360x640; just verify abstract evaluation (shapes) here.
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape[0].shape == (1, 5, 45, 80, 1)
    ge.dryrun_multichip(8)


def test_zoo_adapter_train_step_on_mesh():
    """Stateless zoo variants must train under mesh shardings (the dummy
    carry is rank-4 so the state PartitionSpec applies)."""
    from iip_uavsal_saliency_tpu.models import init_variables
    from iip_uavsal_saliency_tpu.models.adapters import build_adapted_model

    model = build_adapted_model("uavsal_stblocks", time_dims=T)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, T, H, W, 3).astype(np.float32))
    s = model.init_state(H, W, 2)
    y = jnp.asarray((rng.rand(2, T, HO, WO, 2) > 0.7).astype(np.float32))
    variables = init_variables(model, jax.random.PRNGKey(0), x, None, None, s)

    mesh = make_mesh(n_data=2, n_spatial=1)
    tx = make_optimizer(1e-3, 0.0)
    st = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    step = make_train_step(model, tx, mesh=mesh, donate=False)
    _, loss, new_s = step(
        st,
        jax.device_put(x, data_sharding(mesh, 5)),
        None,
        None,
        jax.device_put(s, data_sharding(mesh, 4)),
        jax.device_put(y, data_sharding(mesh, 5)),
    )
    assert np.isfinite(float(loss))
    assert new_s.shape == s.shape


def _setup_s(v, s):
    """Like _setup but with a longer S (multi-clip) frame axis for seq tests."""
    model = UAVSal(time_dims=T)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(v, s, H, W, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32))
    st = model.init_state(H, W, v)
    y = jnp.asarray((rng.rand(v, s, HO, WO, 2) > 0.7).astype(np.float32))
    variables = init_variables(model, jax.random.PRNGKey(0), x, g, o, st)
    return model, variables, (x, g, o, st, y)


def _single_device_reference(model, variables, batch):
    x, g, o, st, y = batch
    tx = make_optimizer(1e-3, 0.0)
    st0 = create_train_state(variables, tx)
    step0 = make_train_step(model, tx, donate=False)
    return tx, step0(st0, x, g, o, st, y)


def _assert_step_matches(ref, got):
    st0b, loss0, rnn0 = ref
    st1b, loss1, rnn1 = got
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rnn0), np.asarray(rnn1), atol=0.03)
    p0 = np.asarray(jax.tree_util.tree_leaves(st0b.params)[0])
    p1 = np.asarray(jax.tree_util.tree_leaves(st1b.params)[0])
    agree = np.mean(np.abs(p0 - p1) < 5e-4)
    assert agree > 0.98, f"only {agree:.3f} of params agree"


def test_train_step_seq_parallel_matches_single_device():
    """Time-axis sequence parallelism (SURVEY §2.5): frames sharded over
    'seq'. XLA inserts the ±1-frame halo exchange for the temporal-difference
    stencil (reference: model.py:194-198), the cross-shard reductions for
    train-mode BN statistics, and the gather feeding the sequential TWA scan.
    Must equal the unsharded step."""
    model, variables, batch = _setup_s(v=1, s=2 * T)
    tx, ref = _single_device_reference(model, variables, batch)
    x, g, o, st, y = batch

    mesh = make_mesh(n_data=1, n_spatial=1, n_seq=2)
    st1 = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    step1 = make_train_step(model, tx, mesh=mesh, donate=False)
    got = step1(
        st1,
        jax.device_put(x, data_sharding(mesh, 5, seq_axis=1)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(st, data_sharding(mesh, 4)),
        jax.device_put(y, data_sharding(mesh, 5, seq_axis=1)),
    )
    _assert_step_matches(ref, got)


def test_train_step_tensor_parallel_matches_single_device():
    """Channel-axis tensor parallelism (SURVEY §2.5): 1x1-conv kernels and
    their Adam moments sharded on output channels over 'model'
    (param_sharding_rules); XLA partitions the matmuls. Must equal the
    unsharded step."""
    from iip_uavsal_saliency_tpu.parallel import (
        param_sharding_rules,
        train_state_shardings,
    )

    model, variables, batch = _setup_s(v=1, s=T)
    tx, ref = _single_device_reference(model, variables, batch)
    x, g, o, st, y = batch

    mesh = make_mesh(n_data=1, n_spatial=1, n_seq=1, n_model=2)
    state = create_train_state(variables, tx)
    shardings = train_state_shardings(mesh, state)
    # the rules must actually shard something (the big pointwise kernels)
    specs = {s.spec for s in jax.tree_util.tree_leaves(
        param_sharding_rules(mesh, state.params),
        is_leaf=lambda l: hasattr(l, "spec"))}
    assert any(spec != () and any(spec) for spec in specs), "TP rules sharded nothing"

    st1 = jax.device_put(state, shardings)
    step1 = make_train_step(
        model, tx, mesh=mesh, donate=False, state_shardings=shardings
    )
    got = step1(
        st1,
        jax.device_put(x, data_sharding(mesh, 5)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(st, data_sharding(mesh, 4)),
        jax.device_put(y, data_sharding(mesh, 5)),
    )
    _assert_step_matches(ref, got)


def test_train_step_dp_seq_tp_combined():
    """Full 3-way combination on all 8 devices: videos on 'data', frames on
    'seq', channels on 'model' — one step runs and matches the single-device
    result."""
    from iip_uavsal_saliency_tpu.parallel import train_state_shardings

    model, variables, batch = _setup_s(v=2, s=2 * T)
    tx, ref = _single_device_reference(model, variables, batch)
    x, g, o, st, y = batch

    mesh = make_mesh(n_data=2, n_spatial=1, n_seq=2, n_model=2)
    state = create_train_state(variables, tx)
    shardings = train_state_shardings(mesh, state)
    st1 = jax.device_put(state, shardings)
    step1 = make_train_step(
        model, tx, mesh=mesh, donate=False, state_shardings=shardings
    )
    got = step1(
        st1,
        jax.device_put(x, data_sharding(mesh, 5, seq_axis=1)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(st, data_sharding(mesh, 4)),
        jax.device_put(y, data_sharding(mesh, 5, seq_axis=1)),
    )
    _assert_step_matches(ref, got)


def test_make_mesh_rejects_oversized_factors():
    with pytest.raises(ValueError):
        make_mesh(n_data=16)  # 16 > 8 devices
    with pytest.raises(ValueError):
        # default n_data floors to 0 -> explicit error, not a 0-device mesh
        make_mesh(n_spatial=16)


def test_partitionable_model_forces_xla_twa():
    from iip_uavsal_saliency_tpu.parallel.steps import _partitionable_model

    # seq/spatial/model-sharded meshes: kernel forced off (the V-axis
    # partitioning rule would all-gather activations there)
    mesh = make_mesh(n_data=2, n_seq=2, n_model=2)
    m = _partitionable_model(UAVSal(time_dims=5), mesh)
    assert m.twa_pallas is False
    m = _partitionable_model(UAVSal(time_dims=5, twa_pallas=True), mesh)
    assert m.twa_pallas is False  # explicit True is overridden
    # pure data-parallel mesh: the custom_partitioning rule shards V, so
    # auto stays (kernel runs unmodified per shard)
    dp = make_mesh(n_data=8)
    m = _partitionable_model(UAVSal(time_dims=5), dp)
    assert m.twa_pallas is None
    single = make_mesh(n_data=1)
    m = _partitionable_model(UAVSal(time_dims=5), single)
    assert m.twa_pallas is None  # single-device mesh: auto stays


def test_infer_step_dp_shard_map_matches_single_device():
    """The data-parallel serving path is a shard_map (each device runs the
    whole single-device program on its videos — this is what lets the fused
    Pallas TWA kernel run un-partitioned on multi-chip DP). Outputs must
    equal the unsharded step exactly (no cross-device reductions exist)."""
    model, variables, (x, g, o, s, y) = _setup(v=4)
    inf0 = make_infer_step(model)
    out0, rnn0 = inf0(variables["params"], variables["batch_stats"], x, g, o, s)

    mesh = make_mesh(n_data=4)
    inf1 = make_infer_step(model, mesh=mesh)
    out1, rnn1 = inf1(
        variables["params"], variables["batch_stats"],
        jax.device_put(x, data_sharding(mesh, 5)),
        jax.device_put(g, replicated(mesh)),
        jax.device_put(o, replicated(mesh)),
        jax.device_put(s, data_sharding(mesh, 4)),
    )
    # shard_map changes XLA fusion boundaries: bit-identity is not expected,
    # but deviations stay at f32 rounding level (measured 1e-5 on |x|~3).
    np.testing.assert_allclose(
        np.asarray(out0), np.asarray(out1), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(rnn0), np.asarray(rnn1), rtol=1e-5, atol=2e-5
    )


def test_pallas_twa_composes_with_shard_map():
    """The fused TWA kernel (interpret mode on CPU) under shard_map over
    'data' == the XLA scan on the full batch: the exact composition the
    DP serving path uses on real multi-chip TPU."""
    from jax.sharding import PartitionSpec as P

    from iip_uavsal_saliency_tpu.ops.pallas_twa import twa_scan_pallas, twa_scan_xla

    rng = np.random.RandomState(5)
    v, s, h, w, c = 4, 3, 12, 8, 8
    x = jnp.asarray(rng.randn(v, s, h, w, c).astype(np.float32) * 0.5)
    gx = jnp.asarray(rng.randn(v, s, h, w, c).astype(np.float32) * 0.5)
    w_h = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(v, h, w, c).astype(np.float32) * 0.5)

    mesh = make_mesh(n_data=4)
    # check_vma=False as in make_infer_step's DP path: the Pallas custom
    # call cannot declare varying-mesh-axes on its out_shape.
    sm = jax.shard_map(
        lambda x, gx, w_h, h0: twa_scan_pallas(x, gx, w_h, h0, interpret=True),
        mesh=mesh,
        in_specs=(P("data"), P("data"), P(), P("data")),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    ys_p, hl_p = jax.jit(sm)(x, gx, w_h, h0)
    ys_x, hl_x = twa_scan_xla(x, gx, w_h, h0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hl_p), np.asarray(hl_x), rtol=2e-5, atol=2e-6)


def test_twa_sharded_gspmd_matches_xla():
    """twa_scan_sharded (the custom_partitioning-wrapped kernel) under a
    GSPMD jit: V-sharded on a pure data mesh it runs the kernel per shard;
    on a data x seq mesh (x sharded on S too) GSPMD inserts the reshard the
    rule demands. Both must match the XLA scan; the gradient path (the
    custom_vjp twa_scan with the XLA-recompute backward) must also compile
    and match under the mesh."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    import iip_uavsal_saliency_tpu.ops.pallas_twa as ptwa
    from iip_uavsal_saliency_tpu.ops.pallas_twa import (
        twa_scan,
        twa_scan_sharded,
        twa_scan_xla,
    )

    rng = np.random.RandomState(7)
    v, s, h, w, c = 4, 4, 12, 8, 8
    x = jnp.asarray(rng.randn(v, s, h, w, c).astype(np.float32) * 0.5)
    gx = jnp.asarray(rng.randn(v, s, h, w, c).astype(np.float32) * 0.5)
    w_h = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.randn(v, h, w, c).astype(np.float32) * 0.5)
    ys_x, hl_x = twa_scan_xla(x, gx, w_h, h0)

    ptwa.INTERPRET = True
    try:
        for mesh, x_spec in (
            (make_mesh(n_data=4), P("data")),
            (make_mesh(n_data=2, n_seq=2), P("data", "seq")),
        ):
            rep = NamedSharding(mesh, P())
            xs = NamedSharding(mesh, x_spec)
            ss = NamedSharding(mesh, P(x_spec[0] if len(x_spec) else None))
            args = (
                jax.device_put(x, xs),
                jax.device_put(gx, xs),
                jax.device_put(w_h, rep),
                jax.device_put(h0, ss),
            )
            ys_p, hl_p = jax.jit(twa_scan_sharded)(*args)
            np.testing.assert_allclose(
                np.asarray(ys_p), np.asarray(ys_x), rtol=2e-5, atol=2e-6,
                err_msg=str(dict(mesh.shape)),
            )
            np.testing.assert_allclose(
                np.asarray(hl_p), np.asarray(hl_x), rtol=2e-5, atol=2e-6,
            )

        # gradient under the data mesh: Pallas forward, XLA-recompute bwd
        mesh = make_mesh(n_data=4)
        xs = NamedSharding(mesh, P("data"))

        def loss_p(w_h, x, gx, h0):
            ys, _ = twa_scan(x, gx, w_h, h0)
            return (ys * ys).mean()

        def loss_x(w_h, x, gx, h0):
            ys, _ = twa_scan_xla(x, gx, w_h, h0)
            return (ys * ys).mean()

        g_p = jax.jit(jax.grad(loss_p))(
            jax.device_put(w_h, NamedSharding(mesh, P())),
            jax.device_put(x, xs), jax.device_put(gx, xs),
            jax.device_put(h0, xs),
        )
        g_x = jax.grad(loss_x)(w_h, x, gx, h0)
        np.testing.assert_allclose(
            np.asarray(g_p), np.asarray(g_x), rtol=2e-5, atol=2e-6
        )
    finally:
        ptwa.INTERPRET = False


def test_state_sharding_rank_aware():
    """The carried-state sharding puts 'spatial' on the ROW axis for both
    state ranks: UAVSal (V,H,W,C) and UAVSalLSTM (V,2,H,W,C) — a fixed
    rank-4 spec would shard the LSTM's size-2 h/c axis instead."""
    from jax.sharding import PartitionSpec as P

    from iip_uavsal_saliency_tpu.models.uavsal import UAVSalLSTM
    from iip_uavsal_saliency_tpu.parallel.steps import _state_sharding

    mesh = make_mesh(n_data=2, n_spatial=4)
    assert _state_sharding(UAVSal(time_dims=5), mesh).spec == P(
        "data", "spatial", None, None
    )
    assert _state_sharding(UAVSalLSTM(time_dims=5), mesh).spec == P(
        "data", None, "spatial", None, None
    )


def test_infer_step_dp_shard_map_lstm_state_rank():
    """The pure-DP shard_map serving path must accept the LSTM's rank-5
    carried state (a fixed rank-4 spec raises a shard_map rank mismatch)."""
    from iip_uavsal_saliency_tpu.models.uavsal import UAVSalLSTM
    from iip_uavsal_saliency_tpu.parallel.steps import make_infer_step

    mesh = make_mesh(n_data=2)
    model = UAVSalLSTM(time_dims=2, num_stblock=1)
    h = w = 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (2, 2, h, w, 3), np.uint8))
    g = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(h // 8, w // 8, 20).astype(np.float32))
    st = model.init_state(h, w, 2)
    xf = x.astype(jnp.float32) / 255.0
    from iip_uavsal_saliency_tpu.models import init_variables

    variables = init_variables(model, jax.random.PRNGKey(0), xf, g, o, st)
    step = make_infer_step(model, mesh=mesh)
    out, new_st = step(
        variables["params"], variables.get("batch_stats", {}), x, g, o, st
    )
    assert out.shape == (2, 2, h // 8, w // 8, 1)
    assert new_st.shape == st.shape
    assert bool(jnp.isfinite(out).all())


def test_make_mesh_warns_on_idle_devices(caplog):
    """A mesh that cannot use every device must say so (silent truncation
    reads as full utilization)."""
    import logging

    with caplog.at_level(logging.WARNING, logger="uavsal.mesh"):
        mesh = make_mesh(n_data=2, n_seq=3)  # 6 of 8 devices
    assert mesh.size == 6
    assert "2 sit idle" in caplog.text

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="uavsal.mesh"):
        make_mesh(n_data=2, n_seq=2, n_model=2)  # exactly 8
    assert "sit idle" not in caplog.text
