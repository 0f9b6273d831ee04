"""Mixed-precision (bf16-compute) training: masters stay f32, losses track f32.

The opt-in `compute_dtype=jnp.bfloat16` train step casts params/activations
to bf16 at the step boundary; master params, Adam moments, BN running stats,
gradients, and the loss itself stay f32 (parallel/steps.make_train_step).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iip_uavsal_saliency_tpu.models import UAVSal, init_variables
from iip_uavsal_saliency_tpu.parallel import create_train_state, make_train_step
from iip_uavsal_saliency_tpu.training import make_optimizer

pytestmark = pytest.mark.slow  # compiles the model twice

H, W, T = 64, 64, 5
HO, WO = H // 8, W // 8


def _batch(seed):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(1, T, H, W, 3).astype(np.float32))
    y = jnp.asarray((rng.rand(1, T, HO, WO, 2) > 0.7).astype(np.float32))
    return x, y


def test_mixed_precision_tracks_f32():
    model = UAVSal(time_dims=T)
    rng = np.random.RandomState(0)
    g = jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32))
    s0 = model.init_state(H, W, 1)
    x0, _ = _batch(0)
    variables = init_variables(model, jax.random.PRNGKey(0), x0, g, o, s0)
    tx = make_optimizer(learning_rate=1e-3, weight_decay=5e-5)

    def run(compute_dtype, n=4):
        step = make_train_step(model, tx, donate=False, compute_dtype=compute_dtype)
        state = create_train_state(variables, tx)
        x, y = _batch(0)  # one fixed batch: repeated steps must reduce loss
        st, losses = s0, []
        for _ in range(n):
            state, loss, st = step(state, x, g, o, st, y)
            losses.append(float(loss))
        return state, st, losses

    state32, rnn32, losses32 = run(None)
    state16, rnn16, losses16 = run(jnp.bfloat16)

    # master state stays f32 on the mixed path
    for leaf in jax.tree_util.tree_leaves(
        (state16.params, state16.opt_state, state16.batch_stats)
    ):
        assert leaf.dtype != jnp.bfloat16, "bf16 leaked into the master state"
    assert rnn16.dtype == jnp.float32

    # losses decrease and track the f32 trajectory within bf16 noise
    losses32, losses16 = np.array(losses32), np.array(losses16)
    assert losses32[-1] < losses32[0]
    assert losses16[-1] < losses16[0]
    np.testing.assert_allclose(losses16, losses32, rtol=0.12)

    # update magnitudes match (per-weight values don't: Adam normalizes each
    # coordinate, so bf16 gradient noise flips individual step directions)
    init = create_train_state(variables, tx).params
    d32 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).mean()),
                                 state32.params, init)
    d16 = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).mean()),
                                 state16.params, init)
    m32 = np.mean(jax.tree_util.tree_leaves(d32))
    m16 = np.mean(jax.tree_util.tree_leaves(d16))
    assert 0.5 < m16 / m32 < 2.0, (m16, m32)


def test_remat_step_matches_plain():
    """remat=True (jax.checkpoint around the forward) must produce the SAME
    loss, BN-stat updates, carried state, and gradients as the plain step —
    remat changes when activations are (re)computed, not what is computed.
    (Post-ADAM params are NOT compared: the recomputed backward's float
    rounding can flip the sign of near-zero gradient coordinates, which
    Adam's per-coordinate normalization amplifies to a full lr-sized step —
    so gradients are pinned via an SGD(1) step, where params_delta == -grad.)
    Composes with mixed precision. Where the backend reports a compiled
    memory analysis, rematerialization must not increase temp memory."""
    import optax

    model = UAVSal(time_dims=T)
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32))
    s0 = model.init_state(H, W, 1)
    x, y = _batch(1)
    variables = init_variables(model, jax.random.PRNGKey(1), x, g, o, s0)
    tx = optax.sgd(1.0)  # params_new = params - grad: exposes raw gradients

    def run(remat, compute_dtype=None, opt=tx):
        step = make_train_step(
            model, opt, donate=False, compute_dtype=compute_dtype, remat=remat
        )
        state = create_train_state(variables, opt)
        state, loss, st = step(state, x, g, o, s0, y)
        return step, state, float(loss), st

    step_p, state_p, loss_p, st_p = run(False)
    step_r, state_r, loss_r, st_r = run(True)
    # the primal forward is computed once either way: loss, BN-stat updates,
    # and the carried recurrent state must be exactly equal
    assert loss_r == pytest.approx(loss_p, rel=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        (state_r.batch_stats, st_r), (state_p.batch_stats, st_p),
    )
    # gradients (== init - post-SGD(1) params): equal up to the f32 noise
    # floor. The recomputed backward fuses/reassociates reductions
    # differently, and at init the graph is ill-conditioned (an f64 referee
    # puts BOTH f32 backwards ~equally far from truth, while plain-vs-remat
    # is 4 orders of magnitude closer). Per-coordinate tolerances are
    # meaningless under that cancellation noise, so compare the GLOBAL
    # gradient vector: measured deviation is ~2e-5 of the gradient scale;
    # a wiring bug (dropped term, stale activation, wrong sign) shifts
    # whole layers O(1).
    def leaf_grads(params):
        return jax.tree_util.tree_map(
            lambda p0, p: np.asarray(p0, np.float64) - np.asarray(p, np.float64),
            variables["params"], params,
        )

    gp_t, gr_t = leaf_grads(state_p.params), leaf_grads(state_r.params)
    gp = np.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(gp_t)])
    gr = np.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(gr_t)])
    # measured noise floor in this env: 3.4e-3 global rel-L2, worst
    # significant leaf 6.7% rel-L2 / norm ratio 1.04 — bounds are ~2x that
    assert np.linalg.norm(gr - gp) <= 2e-2 * np.linalg.norm(gp)

    def leaf_close(a, b):
        nb = np.linalg.norm(b)
        if nb < 1e-3:  # numerically-zero leaves carry only rounding noise
            return
        assert np.linalg.norm(a - b) <= 0.15 * nb
        assert 0.9 <= np.linalg.norm(a) / nb <= 1.1

    jax.tree_util.tree_map(leaf_close, gr_t, gp_t)

    # bf16 + remat compose with the real optimizer (loss in the same
    # ballpark as the plain bf16 step)
    adam = make_optimizer(learning_rate=1e-3, weight_decay=5e-5)
    _, _, loss_b, _ = run(False, jnp.bfloat16, adam)
    _, _, loss_br, _ = run(True, jnp.bfloat16, adam)
    assert loss_br == pytest.approx(loss_b, rel=0.05)

    def temp_bytes(step):
        try:  # make_train_step returns a jitted fn: lower directly
            mem = step.lower(
                create_train_state(variables, tx), x, g, o, s0, y
            ).compile().memory_analysis()
            return getattr(mem, "temp_size_in_bytes", None)
        except Exception:
            return None

    tp, tr = temp_bytes(step_p), temp_bytes(step_r)
    if tp and tr:
        assert tr <= tp * 1.05, f"remat increased temp memory: {tr} vs {tp}"
