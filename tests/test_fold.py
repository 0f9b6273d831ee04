"""Serving-time BN fold (ops/fold.py): exactness, idempotence, structure.

The fold must be invisible to a user: same variable-tree structure, same
compiled program, outputs equal to the unfolded eval forward within f32
rounding (reference eval semantics: model.py:65-72 BasicConv2d + torch BN
running stats).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iip_uavsal_saliency_tpu.ops.fold import fold_batchnorm, looks_folded


def _rand_stats(variables, seed=3):
    """Replace the init-default BN stats (mean 0 / var 1) with random values
    so the fold actually has something to fold."""
    rng = np.random.RandomState(seed)

    def walk(p):
        if isinstance(p, dict):
            if set(p) == {"mean", "var"}:
                return {
                    "mean": jnp.asarray(rng.randn(*np.shape(p["mean"])) * 0.5,
                                        jnp.float32),
                    "var": jnp.asarray(
                        0.25 + rng.rand(*np.shape(p["var"])), jnp.float32
                    ),
                }
            return {k: walk(v) for k, v in p.items()}
        return p

    out = dict(variables)
    out["batch_stats"] = walk(variables["batch_stats"])
    # randomize BN affine params too (init defaults are scale=1/bias=0)
    def walk_p(p, path=""):
        if isinstance(p, dict):
            return {k: walk_p(v, path + "/" + k) for k, v in p.items()}
        if path.endswith("/scale"):
            return jnp.asarray(0.5 + rng.rand(*np.shape(p)), jnp.float32)
        if path.endswith("/bias") and np.ndim(p) == 1:
            return jnp.asarray(rng.randn(*np.shape(p)) * 0.1, jnp.float32)
        return p

    out["params"] = walk_p(variables["params"])
    return out


def _tree_leaves_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}


def test_fold_single_dwblock_exact():
    """One DWBlock: folded forward == unfolded eval forward (fast tier)."""
    from iip_uavsal_saliency_tpu.ops.layers import DWBlock

    blk = DWBlock(features=32, kernel_size=3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 32), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x, train=False)
    variables = _rand_stats(variables)

    y_ref = blk.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    y_fold = blk.apply(folded, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-5)

    # structure unchanged, identity stats in place
    assert jax.tree_util.tree_structure(folded) == jax.tree_util.tree_structure(
        variables
    )
    for path, leaf in _tree_leaves_with_paths(folded["batch_stats"]).items():
        if path.endswith("['mean']"):
            np.testing.assert_array_equal(leaf, 0.0, err_msg=path)
        if path.endswith("['var']"):
            np.testing.assert_array_equal(leaf, 1.0, err_msg=path)


def test_fold_idempotent_and_bf16_safe():
    from iip_uavsal_saliency_tpu.ops.layers import ConvBNAct

    mod = ConvBNAct(16, kernel_size=3)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 6, 6, 8), jnp.float32)
    variables = _rand_stats(mod.init(jax.random.PRNGKey(1), x, train=False))
    f1 = fold_batchnorm(variables)
    f2 = fold_batchnorm(f1)
    for (p1, a), (p2, b) in zip(
        sorted(_tree_leaves_with_paths(f1).items()),
        sorted(_tree_leaves_with_paths(f2).items()),
    ):
        assert p1 == p2
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=p1)

    # every folded value must survive a bf16 cast without breaking the
    # identity: the serving path casts all f32 leaves (runners/infer.py)
    cast = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16).astype(jnp.float32), jnp.asarray(f1["batch_stats"]["bn"]["var"])
    )
    np.testing.assert_array_equal(np.asarray(cast), 1.0)


def test_looks_folded_detects_the_fold_signature():
    """looks_folded: True after fold_batchnorm, False on raw variables AND
    on a fresh init (whose stats are also mean=0/var=1 but whose BN scale is
    1.0, not the fold's sqrt(1+eps)) — the Trainer uses it to reject folded
    pre_variables, whose fine-tuning would double-count the absorbed scale."""
    from iip_uavsal_saliency_tpu.ops.layers import DWBlock

    blk = DWBlock(features=32, kernel_size=3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 32), jnp.float32)
    fresh = blk.init(jax.random.PRNGKey(0), x, train=False)
    assert not looks_folded(fresh)  # identity stats but scale=1.0
    trained_like = _rand_stats(fresh)
    assert not looks_folded(trained_like)
    assert looks_folded(fold_batchnorm(trained_like))
    assert looks_folded(fold_batchnorm(fresh))


def test_trainer_rejects_folded_pre_variables(tmp_path):
    """Trainer(pre_variables=<folded>) fails loudly instead of silently
    training a model whose conv kernels already absorbed the BN scale.
    A one-DWBlock folded tree carries the full signature, so the guard
    fires before any model init/compile."""
    from iip_uavsal_saliency_tpu.ops.layers import DWBlock
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer

    blk = DWBlock(features=32, kernel_size=3)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 8, 8, 32), jnp.float32)
    folded = fold_batchnorm(_rand_stats(blk.init(jax.random.PRNGKey(0), x,
                                                 train=False)))
    cfg = TrainConfig(iosize=(64, 128, 8, 16), time_dims=5, batch_size=1,
                      bias_type=(0, 0, 0), num_stblock=1)
    with pytest.raises(ValueError, match="fold"):
        Trainer(cfg, str(tmp_path), "UAV2", str(tmp_path / "out"),
                pre_variables=folded)


def test_fold_passthrough_unmatched():
    """Biased convs (VGG-style) and non-BN leaves pass through untouched."""
    variables = {
        "params": {
            "conv1_1": {"kernel": np.ones((3, 3, 3, 4), np.float32),
                        "bias": np.zeros(4, np.float32)},
            "rnn": {"kernel": np.ones((3, 3, 8, 4), np.float32)},
        },
        "batch_stats": {},
    }
    out = fold_batchnorm(variables)
    np.testing.assert_array_equal(out["params"]["conv1_1"]["kernel"],
                                  variables["params"]["conv1_1"]["kernel"])
    np.testing.assert_array_equal(out["params"]["rnn"]["kernel"],
                                  variables["params"]["rnn"]["kernel"])


@pytest.mark.slow
def test_fold_full_model_exact(uavsal_small):
    """Full UAVSal: folded == unfolded stateful forward (the serving-load
    default, runners/infer.load_model_for_inference).

    Tolerance: per-layer the fold is exact to ~1e-5 (the DWBlock test
    above), but reassociating `(conv(x)-mean)*s` into `conv'(x)+b'` changes
    f32 rounding per layer, and ~50 folded layers + the TWA recurrence
    compound it — measured max |delta| ~1e-3 on the sigmoid output under
    adversarially randomized BN stats, i.e. under ONE uint8 postprocess
    quantum (1/255=0.0039). The metric-level guarantee for the real serving
    path is test_bf16_metric_parity (CC/NSS/SIM deltas)."""
    model, variables, (x, g, o, s) = uavsal_small
    variables = _rand_stats(variables)
    y_ref, st_ref = jax.jit(lambda v: model.apply(v, x, g, o, s))(variables)
    folded = fold_batchnorm(variables)
    y_fold, st_fold = jax.jit(lambda v: model.apply(v, x, g, o, s))(folded)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=2.5e-3)
    np.testing.assert_allclose(np.asarray(st_fold), np.asarray(st_ref),
                               atol=2.5e-2)


def test_fold_composes_with_s2d_stem(uavsal_small):
    """The serving-load fold and the space-to-depth stem compose: the s2d
    kernel regrouping is linear in the kernel, so it commutes with the
    fold's per-output-channel rescale (same folded variables, same
    output)."""
    from iip_uavsal_saliency_tpu.models import UAVSal

    model, variables, (x, g, o, s) = uavsal_small
    variables = _rand_stats(variables)
    folded = fold_batchnorm(variables)
    y_plain, st_plain = jax.jit(lambda v: model.apply(v, x, g, o, s))(folded)
    m2 = UAVSal(time_dims=model.time_dims, s2d_stem=True)
    y_s2d, st_s2d = jax.jit(lambda v: m2.apply(v, x, g, o, s))(folded)
    # same tolerance story as test_fold_full_model_exact: _rand_stats makes
    # folded kernels adversarially scaled, so the stem's different f32
    # contraction order amplifies to ~1e-3 on the sigmoid output — still
    # under one uint8 postprocess quantum (1/255)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_plain),
                               atol=2.5e-3)
    np.testing.assert_allclose(np.asarray(st_s2d), np.asarray(st_plain),
                               atol=2.5e-2)
