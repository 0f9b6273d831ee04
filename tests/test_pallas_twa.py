"""Fused Pallas TWA scan vs the XLA reference scan (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

import iip_uavsal_saliency_tpu.ops.pallas_twa as ptwa
from iip_uavsal_saliency_tpu.ops.pallas_twa import (
    _row_block,
    supports_pallas,
    twa_scan,
    twa_scan_pallas,
    twa_scan_xla,
)


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(dtype) * 0.5)


def _case(v=2, s=4, h=12, w=8, c=8, seed=0):
    x = _rand((v, s, h, w, c), seed)
    gx = _rand((v, s, h, w, c), seed + 1)
    w_h = _rand((3, 3, c, c), seed + 2) * 0.2
    h0 = _rand((v, h, w, c), seed + 3)
    return x, gx, w_h, h0


def test_row_block():
    assert _row_block(45) == 15
    assert _row_block(36) == 12
    assert _row_block(6) == 6
    assert _row_block(13) == 13  # small prime: single whole-height chunk
    assert _row_block(17) is None  # prime > 16 has no divisor <= 16
    assert _row_block(1) is None


def test_pallas_matches_xla_single_chunk():
    x, gx, w_h, h0 = _case(h=6)
    ys_p, hl_p = twa_scan_pallas(x, gx, w_h, h0, interpret=True)
    ys_x, hl_x = twa_scan_xla(x, gx, w_h, h0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hl_p), np.asarray(hl_x), rtol=2e-5, atol=2e-6)


def test_pallas_matches_xla_multi_chunk():
    """H=20 -> row block 10 -> 2 chunks per step; chunk writes must not leak
    into the h_{s-1} reads of the next chunk (ping-pong slots)."""
    x, gx, w_h, h0 = _case(h=20, seed=7)
    ys_p, hl_p = twa_scan_pallas(x, gx, w_h, h0, interpret=True)
    ys_x, hl_x = twa_scan_xla(x, gx, w_h, h0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_x), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(hl_p), np.asarray(hl_x), rtol=2e-5, atol=2e-6)


def test_pallas_videos_are_independent():
    """Video v+1's first step must see ITS h0, not video v's final state."""
    x, gx, w_h, h0 = _case(v=3, seed=11)
    ys_p, _ = twa_scan_pallas(x, gx, w_h, h0, interpret=True)
    for vid in range(3):
        ys_i, _ = twa_scan_pallas(
            x[vid : vid + 1], gx[vid : vid + 1], w_h, h0[vid : vid + 1], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(ys_p[vid]), np.asarray(ys_i[0]), rtol=2e-5, atol=2e-6
        )


def test_custom_vjp_grad_matches_xla():
    x, gx, w_h, h0 = _case(v=1, s=2, h=4, w=4, c=4)

    def loss_pallas(x, gx, w_h, h0):
        ys, hl = twa_scan(x, gx, w_h, h0)
        return jnp.sum(ys**2) + jnp.sum(hl)

    def loss_xla(x, gx, w_h, h0):
        ys, hl = twa_scan_xla(x, gx, w_h, h0)
        return jnp.sum(ys**2) + jnp.sum(hl)

    ptwa.INTERPRET = True
    try:
        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, gx, w_h, h0)
    finally:
        ptwa.INTERPRET = False
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, gx, w_h, h0)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_supports_pallas_gate():
    assert supports_pallas((1, 20, 45, 80, 256), jnp.bfloat16)
    assert not supports_pallas((1, 20, 45, 80, 256), jnp.float32)  # bf16 only
    assert not supports_pallas((1, 20, 17, 80, 256), jnp.bfloat16)  # prime H > 16


def test_pallas_bf16_close_to_xla_f32():
    """The bf16 serving path (what runs on TPU) stays within bf16 tolerance
    of the f32 XLA recurrence."""
    x, gx, w_h, h0 = _case(h=10, seed=21)
    to_bf = lambda a: a.astype(jnp.bfloat16)  # noqa: E731
    ys_p, _ = twa_scan_pallas(
        to_bf(x), to_bf(gx), to_bf(w_h), to_bf(h0), interpret=True
    )
    ys_x, _ = twa_scan_xla(x, gx, w_h, h0)
    np.testing.assert_allclose(
        np.asarray(ys_p, np.float32), np.asarray(ys_x), rtol=0.1, atol=0.05
    )


def test_conv_twa_auto_selects_pallas_when_supported(monkeypatch):
    """use_pallas=None picks the fused kernel on TPU + supported shapes
    (it wins at every measured step length, docs/PERF.md); False forces
    the XLA scan."""
    from iip_uavsal_saliency_tpu.models.recurrent import ConvTWA

    calls = []

    def fake_twa_scan(x, gx, w_h, h0):
        calls.append(x.shape)
        return twa_scan_xla(x, gx, w_h.astype(jnp.float32), h0)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(ptwa, "supports_pallas", lambda shape, dtype: True)
    monkeypatch.setattr(ptwa, "twa_scan", fake_twa_scan)

    def run(s, use_pallas):
        cell = ConvTWA(hidden_dim=8, use_pallas=use_pallas)
        x = _rand((1, s, 6, 8, 8), seed=s)
        h0 = _rand((1, 6, 8, 8), seed=s + 1)
        vs = cell.init(jax.random.PRNGKey(0), x, h0)
        cell.apply(vs, x, h0)

    run(40, None)
    assert calls, "auto should take the Pallas path when supported"
    calls.clear()
    run(20, None)
    assert calls, "auto takes the Pallas path at short steps too"
    calls.clear()
    run(40, False)
    assert not calls, "use_pallas=False must force the XLA scan"
    run(20, True)
    assert calls, "use_pallas=True forces the kernel when supported"


def test_supports_pallas_gates_unaligned_channels():
    """C must be a full 128-lane multiple (the dy-tap concat and im2col
    reshape index the lane axis); unaligned C falls back to the XLA scan
    instead of failing Mosaic compilation."""
    from iip_uavsal_saliency_tpu.ops.pallas_twa import supports_pallas

    assert supports_pallas((1, 5, 40, 80, 256), jnp.bfloat16)
    assert not supports_pallas((1, 5, 40, 80, 192), jnp.bfloat16)
    assert not supports_pallas((1, 5, 40, 80, 256), jnp.float32)


def test_twa_pallas_casts_state_dtype():
    """A default f32 init_state alongside bf16 streams must not crash the
    kernel's init DMA: twa_scan_pallas normalizes dtypes at the boundary."""
    from iip_uavsal_saliency_tpu.ops import pallas_twa as ptwa

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 2, 8, 8, 128).astype(np.float32)).astype(jnp.bfloat16)
    gx = jnp.asarray(rng.rand(1, 2, 8, 8, 128).astype(np.float32)).astype(jnp.bfloat16)
    w_h = jnp.asarray(rng.rand(3, 3, 128, 128).astype(np.float32))  # f32
    h0 = jnp.zeros((1, 8, 8, 128), jnp.float32)                     # f32
    ys, h_last = ptwa.twa_scan_pallas(x, gx, w_h, h0, interpret=True)
    assert ys.dtype == jnp.bfloat16 and h_last.dtype == jnp.bfloat16
    want, want_last = ptwa.twa_scan_xla(x, gx, w_h.astype(jnp.bfloat16), h0.astype(jnp.bfloat16))
    np.testing.assert_allclose(
        np.asarray(ys, np.float32), np.asarray(want, np.float32), atol=0.02
    )
