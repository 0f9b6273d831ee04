"""Jitted, mesh-shardable train / eval / inference steps.

The reference's training inner loop (Demo_Train_Test.py:121-151) is a Python
loop doing forward -> loss -> backward -> Adam -> state detach per clip; here
each of those is ONE compiled XLA program. TBPTT (the reference's
`x_state = [out_state[0].detach()]`, :144) falls out naturally: the carried
recurrent state crosses step boundaries as data, so no gradient flows through
it into the previous clip.

Sharding: pass a Mesh and the steps are jitted with NamedShardings —
video-batch V on 'data', optional image rows on 'spatial'; params/priors
replicated. Gradient all-reduce over 'data' is emitted by XLA from the mean
loss (no hand-written collectives).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..training.losses import loss_fu
from .mesh import data_sharding, replicated


def _maybe_normalize(x):
    """uint8 frames -> on-chip /255 + ImageNet standardize (fused into the
    stem conv's epilogue by XLA). Lets callers ship 4x fewer bytes; f32
    inputs are assumed pre-normalized and pass through (dtype is static
    under jit, so this costs nothing)."""
    if x.dtype == jnp.uint8:
        from ..data.letterbox import IMAGENET_MEAN, IMAGENET_STD

        x = x.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x


def _state_sharding(model, mesh):
    """Rank-aware sharding for the carried recurrent state: image rows over
    'spatial'. UAVSal carries (V, H, W, C); UAVSalLSTM carries (V, 2, H, W, C)
    — the row axis is always ndim-3, and a fixed rank-4 spec would land
    'spatial' on the LSTM's size-2 h/c axis instead."""
    # eval_shape: rank only, no device allocation (the relay can stall loads)
    ndim = jax.eval_shape(lambda: model.init_state(8, 8, 1)).ndim
    return data_sharding(mesh, ndim, spatial_axis=ndim - 3)


def _data_only_mesh(mesh) -> bool:
    """True when every non-'data' axis has size 1 — the pure data-parallel
    case, where each device holds whole videos and the model is
    embarrassingly parallel (eval mode: no cross-video op exists)."""
    if mesh is None:
        return False
    d = dict(mesh.shape)
    return all(d.get(a, 1) == 1 for a in d if a != "data")


def _partitionable_model(model, mesh):
    """Force the XLA TWA scan on meshes that shard NON-'data' axes: the
    fused kernel's custom_partitioning rule (ops/pallas_twa.py:
    twa_scan_sharded) partitions only the video axis, so under seq/spatial/
    model sharding GSPMD would all-gather the activations at the kernel
    boundary — correct but slower than the natively partitionable XLA scan.
    Overrides even an explicit twa_pallas=True on such meshes. Pure
    data-parallel meshes keep the kernel: the rule runs it unmodified on
    each shard's videos.

    (make_infer_step's data-parallel shard_map path does NOT go through
    this — inside shard_map each device runs a single-device program, so
    the fused kernel composes with DP serving; see make_infer_step.)"""
    if (
        mesh is not None
        and getattr(mesh, "size", 1) > 1
        and not _data_only_mesh(mesh)
        and getattr(model, "twa_pallas", False) is not False
    ):
        model = model.clone(twa_pallas=False)
    return model


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def train_state_shardings(mesh, state: TrainState) -> TrainState:
    """Sharding pytree for a TrainState under tensor parallelism: params and
    the optimizer moments (which mirror the kernels' shapes) take the
    channel-sharding rules; BN stats and the step counter stay replicated."""
    from .mesh import param_sharding_rules

    rep = replicated(mesh)
    return TrainState(
        params=param_sharding_rules(mesh, state.params),
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=param_sharding_rules(mesh, state.opt_state),
        step=rep,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable = loss_fu,
    mesh=None,
    donate: bool = True,
    state_shardings=None,
    compute_dtype=None,
    remat: bool = False,
):
    """Build the jitted TBPTT train step.

    step(state, x, gauss, ob, rnn_state, y_true) ->
        (new_state, loss, new_rnn_state)
      x: (V, S, H, W, 3) uint8 (normalized on-chip) or pre-normalized f32;
      y_true: (V, S, Ho, Wo, 2); rnn_state: (V, Ho, Wo, C).

    With a mesh, inputs shard V on 'data', frames on 'seq', image rows on
    'spatial' (axes of size 1 are free). `state_shardings` (see
    `train_state_shardings`) additionally tensor-parallel-shards the params
    and optimizer moments over 'model'.

    `compute_dtype=jnp.bfloat16` enables mixed-precision training: the
    forward/backward graph runs in bf16 (params/activations cast at the
    step boundary) while the MASTER params, Adam moments, BN running
    stats, loss, and gradients stay f32 — bf16's f32-range exponent means
    no loss scaling is needed. Measured ~2x step throughput. Per-batch BN
    statistics are computed from bf16 activations (the documented tradeoff
    of the opt-in), but the running-stat EMA accumulates in f32 (see
    _accumulate_bn) so the masters never re-quantize.

    `remat=True` wraps the forward in `jax.checkpoint`: the backward pass
    recomputes activations instead of storing them, shrinking peak HBM from
    O(activations of the whole clip) to O(inputs + params) at the cost of
    one extra forward (~+33% step FLOPs). Use it to fit larger
    batch_size*time_dims clips (or 360x640 multi-video groups) on one chip;
    gradients match the unrematerialized step to f32 rounding (the
    recomputed backward may reassociate reductions — see
    tests/test_mixed_precision.py for the measured noise floor).
    """

    model = _partitionable_model(model, mesh)

    cast = (
        (lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, t))
        if compute_dtype is not None
        else (lambda t: t)
    )
    uncast = (
        (lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if hasattr(a, "dtype") and a.dtype == compute_dtype else a, t))
        if compute_dtype is not None
        else (lambda t: t)
    )

    def _accumulate_bn(old_f32, old_cast, mutated):
        """f32 EMA accumulation for BN running stats under mixed precision.

        flax computed `mutated = m*cast(old) + (1-m)*batch` in bf16; simply
        up-casting that re-quantizes the f32 accumulator every step. Recover
        the batch contribution `(1-m)*batch = mutated - m*cast(old)` and
        re-apply it to the f32 master: the accumulator never loses mantissa
        bits (the batch statistic itself is bf16-computed, which is the
        documented tradeoff)."""
        from ..ops.layers import BN_MOMENTUM

        return jax.tree_util.tree_map(
            lambda of, oc, mu: BN_MOMENTUM * of
            + (mu.astype(jnp.float32) - BN_MOMENTUM * oc.astype(jnp.float32)),
            old_f32, old_cast, mutated,
        )

    def _forward(params_c, bs_c, x_c, gauss_c, ob_c, rnn_c):
        return model.apply(
            {"params": params_c, "batch_stats": bs_c},
            x_c, gauss_c, ob_c, rnn_c,
            train=True,
            mutable=["batch_stats"],
        )

    forward = jax.checkpoint(_forward) if remat else _forward

    def step(state: TrainState, x, gauss, ob, rnn_state, y_true):
        x = _maybe_normalize(x)

        def compute_loss(params):
            bs_cast = cast(state.batch_stats)
            (out, new_rnn), mutated = forward(
                cast(params), bs_cast, cast(x), cast(gauss), cast(ob),
                cast(rnn_state),
            )
            v, s = out.shape[0], out.shape[1]
            out = out.astype(jnp.float32)  # loss + grads in f32
            loss = loss_fn(
                out.reshape(v * s, *out.shape[2:]), y_true.reshape(v * s, *y_true.shape[2:])
            )
            if compute_dtype is not None:
                new_bs = _accumulate_bn(
                    state.batch_stats, bs_cast, mutated["batch_stats"]
                )
            else:
                new_bs = mutated["batch_stats"]
            return loss, (new_bs, uncast(new_rnn))

        (loss, (new_bs, new_rnn)), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, batch_stats=new_bs, opt_state=new_opt, step=state.step + 1
        )
        return new_state, loss, new_rnn

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    xs = data_sharding(mesh, 5, spatial_axis=2, seq_axis=1)
    ys = data_sharding(mesh, 5, spatial_axis=2, seq_axis=1)
    ss = _state_sharding(model, mesh)
    rep = replicated(mesh)
    ts = state_shardings if state_shardings is not None else rep
    return jax.jit(
        step,
        in_shardings=(ts, xs, rep, rep, ss, ys),
        out_shardings=(ts, rep, ss),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, loss_fn: Callable = loss_fu, mesh=None,
                   param_shardings=None):
    """Validation step: eval-mode BN (running stats), loss only, state carried
    (reference val phase: model.eval() + no backward, Demo_Train_Test.py:95-149)."""
    model = _partitionable_model(model, mesh)

    def step(params, batch_stats, x, gauss, ob, rnn_state, y_true):
        x = _maybe_normalize(x)
        out, new_rnn = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, gauss, ob, rnn_state
        )
        v, s = out.shape[0], out.shape[1]
        loss = loss_fn(
            out.reshape(v * s, *out.shape[2:]), y_true.reshape(v * s, *y_true.shape[2:])
        )
        return loss, new_rnn

    if mesh is None:
        return jax.jit(step)
    xs = data_sharding(mesh, 5, spatial_axis=2, seq_axis=1)
    ys = data_sharding(mesh, 5, spatial_axis=2, seq_axis=1)
    ss = _state_sharding(model, mesh)
    rep = replicated(mesh)
    ps = param_shardings if param_shardings is not None else rep
    return jax.jit(
        step,
        in_shardings=(ps, rep, xs, rep, rep, ss, ys),
        out_shardings=(rep, ss),
    )


def make_baked_infer_step(model, variables, gauss=None, ob=None,
                          compute_dtype=None, out_dtype=None,
                          donate_state: bool = False, mesh=None):
    """Serving step with params/stats/priors BAKED IN as compile-time
    constants: `step(x, state) -> (sal, state)`.

    Weights never change in serving, so passing them as arguments every
    dispatch wastes both dispatch marshalling (~300 buffer handles/step)
    and compile-time knowledge: with np-literal constants XLA folds the
    eval-BN affines into conv weights and precomputes the ENTIRE
    constant-prior conv stack (the gauss/ob streams are frame-independent)
    at compile time. Measured on TPU v5e at the S=80 bf16 serving shape:
    1550 FPS vs 1388 for the argument-passing step (+11.7%) — ABOVE the
    1498 chip-bound of the argument form, so this is folded FLOPs, not
    just dispatch (docs/PERF.md "Baked-constant serving"). The exported
    AOT artifact (runners/export.py) gets the same treatment implicitly.

    `variables`/priors are snapshotted to host np arrays at build time;
    pre-cast them (or pass compute_dtype, which also casts them here).

    `mesh`: a pure-'data' Mesh composes baking with multi-chip DP serving —
    the baked per-device program runs under `jax.shard_map` over 'data'
    (the same construction as make_infer_step's DP branch), with the
    constants replicated into every shard's program at compile time, so
    multi-chip serving sheds the same ~300-buffer-handle dispatch tax that
    baking removed single-chip. Meshes that shard non-'data' axes are
    rejected: baking buys nothing under GSPMD resharding — use
    make_infer_step there."""
    import numpy as np

    def _np(t):
        return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), t)

    if compute_dtype is not None:
        cast = lambda a: (  # noqa: E731
            a.astype(compute_dtype) if np.asarray(a).dtype == np.float32 else a
        )
        variables = jax.tree_util.tree_map(cast, variables)
        gauss = None if gauss is None else cast(jnp.asarray(gauss))
        ob = None if ob is None else cast(jnp.asarray(ob))
    np_vars = _np(variables)
    np_gauss = None if gauss is None else _np(gauss)
    np_ob = None if ob is None else _np(ob)
    inner = _build_infer_fn(model, compute_dtype=compute_dtype,
                            out_dtype=out_dtype)

    def step(x, state):
        return inner(np_vars["params"], np_vars.get("batch_stats", {}),
                     x, np_gauss, np_ob, state)

    donate = (1,) if donate_state else ()
    if mesh is None or mesh.size == 1:
        return jax.jit(step, donate_argnums=donate)
    if not _data_only_mesh(mesh):
        raise ValueError(
            f"make_baked_infer_step wants a pure-'data' mesh (got "
            f"{dict(mesh.shape)}); meshes sharding seq/spatial/model "
            "should use make_infer_step's GSPMD path instead"
        )
    from jax.sharding import PartitionSpec as P

    x_spec = P("data", None, None, None, None)
    s_ndim = jax.eval_shape(lambda: model.init_state(8, 8, 1)).ndim
    s_spec = P("data", *([None] * (s_ndim - 1)))
    # check_vma=False for the same reason as make_infer_step's DP branch:
    # no collectives in the per-device eval program, and the Pallas TWA
    # custom call can't declare varying mesh axes on its out_shape
    sm = jax.shard_map(
        step, mesh=mesh, in_specs=(x_spec, s_spec),
        out_specs=(x_spec, s_spec), check_vma=False,
    )
    return jax.jit(sm, donate_argnums=donate)


def _build_infer_fn(model, out_dtype=None, compute_dtype=None):
    """The raw (unjitted) eval-mode forward used by every serving wrapper:
    `fn(params, batch_stats, x, gauss, ob, rnn_state) -> (sal, new_state)`.
    uint8 frames normalize on-device; compute_dtype=bf16 casts activations,
    carried state, and priors at the step boundary."""
    from ..data.letterbox import IMAGENET_MEAN, IMAGENET_STD

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def step(params, batch_stats, x, gauss, ob, rnn_state):
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 255.0
            x = (x - mean) / std
        if compute_dtype is not None:
            # cast the carried state (and priors) too: a caller passing the
            # model's default f32 init_state would otherwise feed the TWA
            # kernel mismatched dtypes (Mosaic DMA error on TPU)
            x = x.astype(compute_dtype)
            rnn_state = rnn_state.astype(compute_dtype)
            gauss = None if gauss is None else gauss.astype(compute_dtype)
            ob = None if ob is None else ob.astype(compute_dtype)
        out, new_rnn = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, gauss, ob, rnn_state
        )
        out = out.astype(out_dtype if out_dtype is not None else jnp.float32)
        return out, new_rnn

    return step


def make_infer_step(model, mesh=None, out_dtype=None, compute_dtype=None,
                    donate_state: bool = False):
    """Inference step: eval-mode forward, returns (saliency, new_state).
    Accepts uint8 frames and normalizes on-device (cheaper host->HBM).

    `compute_dtype=jnp.bfloat16` runs the serving path: activations in bf16
    (params should be pre-cast), which also enables the fused Pallas TWA
    kernel. On a pure data-parallel mesh (every non-'data' axis of size 1)
    the step is built as a `jax.shard_map` over 'data': each device runs
    the complete single-device program on its own videos — zero
    collectives (eval mode has no cross-video op), and the Pallas kernel
    runs unmodified per-device, so multi-chip DP serving keeps the fused
    kernel instead of paying the XLA-scan fallback. On meshes that also
    shard 'spatial'/'seq'/'model', GSPMD jit is used and the partitionable
    XLA scan is forced — a perf choice, not correctness: the kernel's
    custom_partitioning rule (ops/pallas_twa.twa_scan_sharded) partitions
    only the video axis, so those meshes would all-gather activations at
    the kernel boundary (see _partitionable_model). The saliency output is returned in f32 unless
    out_dtype says otherwise. `donate_state=True` donates the carried
    recurrent state buffer (arg 5) — the serving loop overwrites it every
    step, so XLA can reuse the allocation; don't pass a state you intend
    to reuse."""
    dp_shard_map = mesh is not None and mesh.size > 1 and _data_only_mesh(mesh)
    if not dp_shard_map:
        model = _partitionable_model(model, mesh)
    step = _build_infer_fn(model, out_dtype=out_dtype, compute_dtype=compute_dtype)

    donate = (5,) if donate_state else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)
    if dp_shard_map:
        from jax.sharding import PartitionSpec as P

        rep_spec = P()
        x_spec = P("data", None, None, None, None)
        # rank-aware: UAVSal state is rank 4, UAVSalLSTM's h/c stack rank 5
        s_ndim = jax.eval_shape(lambda: model.init_state(8, 8, 1)).ndim
        s_spec = P("data", *([None] * (s_ndim - 1)))
        # check_vma=False: the per-device program has no collectives (eval
        # mode, no cross-video op), and the Pallas TWA custom call cannot
        # declare varying-mesh-axes on its out_shape — with checking on,
        # shard_map rejects the kernel outright.
        sm = jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(rep_spec, rep_spec, x_spec, rep_spec, rep_spec, s_spec),
            out_specs=(x_spec, s_spec),
            check_vma=False,
        )
        return jax.jit(sm, donate_argnums=donate)
    xs = data_sharding(mesh, 5, spatial_axis=2, seq_axis=1)
    ss = _state_sharding(model, mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, xs, rep, rep, ss),
        out_shardings=(data_sharding(mesh, 5, spatial_axis=2, seq_axis=1), ss),
        donate_argnums=donate,
    )
