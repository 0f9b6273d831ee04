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
