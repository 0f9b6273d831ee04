"""Fused Pallas dwBlock vs the XLA reference and the flax DWBlock."""

import numpy as np
import jax
import jax.numpy as jnp

from iip_uavsal_saliency_tpu.ops.layers import BN_EPS, DWBlock
from iip_uavsal_saliency_tpu.ops.pallas_dwblock import (
    dwblock_ref,
    fold_conv_bn,
    fused_dwblock,
    fused_dwblock_pallas,
    supports_fused_dwblock,
)


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


def _case(n=2, h=12, w=16, c=64, expand=6, co=64, seed=0):
    e = c * expand
    x = _rand((n, h, w, c), seed)
    w1 = _rand((c, e), seed + 1, 0.1)
    b1 = _rand((e,), seed + 2)
    wd = _rand((3, 3, e), seed + 3, 0.3)
    bd = _rand((e,), seed + 4)
    w2 = _rand((e, co), seed + 5, 0.05)
    b2 = _rand((co,), seed + 6)
    return x, w1, b1, wd, bd, w2, b2


def test_pallas_matches_ref_residual():
    args = _case()
    ref = dwblock_ref(*args, True)
    got = fused_dwblock_pallas(*args, True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_matches_ref_no_residual_co_differs():
    args = _case(co=32, seed=7)
    ref = dwblock_ref(*args, False)
    got = fused_dwblock_pallas(*args, False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_matches_ref_chunked_expand():
    # E=384 with EC cap 512 -> single chunk; force chunking via E=768
    args = _case(c=128, expand=6, co=128, seed=11)  # E=768 -> 2 chunks of 384
    ref = dwblock_ref(*args, True)
    got = fused_dwblock_pallas(*args, True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_matches_flax_dwblock_folded():
    """Eval-mode flax DWBlock == fused kernel on BN-folded weights."""
    c, co = 48, 48
    block = DWBlock(features=co, kernel_size=3, expand_ratio=6)
    x = _rand((2, 10, 8, c), 21)
    vs = block.init(jax.random.PRNGKey(0), x, False)
    # randomize BN stats/affine so folding is non-trivial
    rng = np.random.RandomState(3)
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) * 0.5 + 0.5), vs
    )
    want = block.apply(vs, x, False)

    p, s = vs["params"], vs["batch_stats"]
    w1, b1 = fold_conv_bn(
        p["expand"]["conv"]["kernel"][0, 0], p["expand"]["bn"]["scale"],
        p["expand"]["bn"]["bias"], s["expand"]["bn"]["mean"],
        s["expand"]["bn"]["var"], BN_EPS,
    )
    wd, bd = fold_conv_bn(
        p["dw"]["conv"]["kernel"][:, :, 0, :], p["dw"]["bn"]["scale"],
        p["dw"]["bn"]["bias"], s["dw"]["bn"]["mean"], s["dw"]["bn"]["var"], BN_EPS,
    )
    w2, b2 = fold_conv_bn(
        p["project"]["kernel"][0, 0], p["project_bn"]["scale"],
        p["project_bn"]["bias"], s["project_bn"]["mean"],
        s["project_bn"]["var"], BN_EPS,
    )
    got = fused_dwblock_pallas(x, w1, b1, wd, bd, w2, b2, True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)


def test_fused_dwblock_grad_matches_ref():
    args = _case(n=1, h=6, w=8, c=32, expand=6, co=32, seed=31)

    def loss_fused(*a):
        return jnp.sum(fused_dwblock(*a, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(dwblock_ref(*a, True) ** 2)

    import iip_uavsal_saliency_tpu.ops.pallas_dwblock as pdw

    pdw.INTERPRET = True
    try:
        g_f = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    finally:
        pdw.INTERPRET = False
    g_r = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_supports_gate():
    ok = supports_fused_dwblock((20, 45, 80, 256), jnp.bfloat16, 3, 1, 1, 6, 256)
    assert ok
    assert not supports_fused_dwblock((20, 45, 80, 256), jnp.float32, 3, 1, 1, 6, 256)
    assert not supports_fused_dwblock((20, 45, 80, 256), jnp.bfloat16, 3, 2, 1, 6, 256)
    assert not supports_fused_dwblock((20, 45, 80, 256), jnp.bfloat16, 3, 1, 6, 6, 256)
    assert not supports_fused_dwblock((20, 17, 80, 256), jnp.bfloat16, 3, 1, 1, 6, 256)
    assert not supports_fused_dwblock((20, 45, 80, 16), jnp.bfloat16, 3, 1, 1, 6, 16)


def test_bf16_close_to_f32():
    args = _case(seed=41)
    to_bf = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    got = fused_dwblock_pallas(*[to_bf(a) for a in args], True, interpret=True)
    ref = dwblock_ref(*args, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), rtol=0.1, atol=0.2
    )


def test_dwblock_module_fused_path_matches_unfused():
    """DWBlock auto-fused eval path == the unfused flax path, and the
    variable trees (names, shapes, init values) are identical."""
    import iip_uavsal_saliency_tpu.ops.pallas_dwblock as pdw

    block_fused = DWBlock(features=64, kernel_size=3, use_pallas=True)
    block_plain = DWBlock(features=64, kernel_size=3)  # default = flax path
    x = _rand((2, 12, 16, 64), 51)
    vs = block_plain.init(jax.random.PRNGKey(7), x, False)
    rng = np.random.RandomState(9)
    vs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) * 0.4 + 0.3), vs
    )
    want = np.asarray(block_plain.apply(vs, x, False))

    xb = x.astype(jnp.bfloat16)
    vsb = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vs)
    pdw.INTERPRET = True
    try:
        got = np.asarray(
            block_fused.apply(vsb, xb, False), np.float32
        )
        vs2 = block_fused.init(jax.random.PRNGKey(7), xb, False)
    finally:
        pdw.INTERPRET = False

    assert jax.tree_util.tree_structure(vs2) == jax.tree_util.tree_structure(vs)
    k1 = vs["params"]["expand"]["conv"]["kernel"]
    k2 = vs2["params"]["expand"]["conv"]["kernel"]
    assert k1.shape == k2.shape
    np.testing.assert_allclose(got, want, rtol=0.15, atol=0.3)
    # and with the gate off on CPU (INTERPRET False), auto falls back cleanly
    plain_again = np.asarray(block_fused.apply(vs, x, False))
    np.testing.assert_allclose(plain_again, want, rtol=1e-6, atol=1e-6)


def test_supports_fused_dwblock_residual_exemption():
    """Unaligned output channels reject the kernel UNLESS the block is
    residual (co == c is padded to the full 128-lane tile inside the
    kernel, the co_trim path)."""
    from iip_uavsal_saliency_tpu.ops.pallas_dwblock import supports_fused_dwblock

    shape = (4, 32, 32, 192)
    assert not supports_fused_dwblock(shape, jnp.bfloat16, 3, 1, 1, 6, 192)
    assert supports_fused_dwblock(shape, jnp.bfloat16, 3, 1, 1, 6, 192,
                                  residual=True)
