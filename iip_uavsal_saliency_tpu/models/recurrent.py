"""Stateful convolutional recurrences as `lax.scan`s.

TPU-native re-design of the reference's recurrent cells
(reference: model_convlstm.py — ConvTWA :238-401, ConvLSTM :73-236,
ConvTWA_DW :403-566, ConvSimGRU :568-731).

Key optimization (all gate-conv cells): the gate convolution over
`concat([x_t, h_{t-1}])` is linear, so it splits into

    conv([x, h], W) = conv(x, W[:, :, :Cin]) + conv(h, W[:, :, Cin:]).

The input half is hoisted out of the recurrence and computed for ALL frames
in one large batched conv (MXU-saturating); the scan body only runs the small
hidden-state conv plus the elementwise gate. The reference instead re-runs the
full concat-conv per frame in a Python loop (model_convlstm.py:364-377).

All cells are stateless flax modules: call with the input sequence and the
carried state; the new state is returned (the reference hardcodes
`.cuda()`-allocated zero states at model_convlstm.py:295 — here `init_state`
is an explicit, device-agnostic helper).

Layout: sequences are (S, H, W, C) frame-major; state is (H, W, C).
Batched (multi-video) use goes through `jax.vmap` / sharded maps in
`parallel/` — recurrence is sequential in S but embarrassingly parallel
across videos.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.initializers import make_conv_init
from ..ops.layers import DWBlock

# the cells' gate conv and the Pallas kernel's VJP-recompute path
# (twa_scan_xla) must stay bit-identical — one shared 'same'-conv helper
from ..ops.pallas_twa import _conv_hwio


class ConvTWA(nn.Module):
    """Temporal-weighted-average recurrence (the flagship TWA-Net cell).

        i_t = sigmoid(conv([x_t, h_{t-1}], W))
        h_t = i_t * x_t + (1 - i_t) * h_{t-1}

    (reference: model_convlstm.py:276-292). `use_bias=False` matches the
    UAVSal instantiation (reference: model.py:328-329).

    Accepts (S, H, W, C) with state (H, W, C), or batched (V, S, H, W, C)
    with state (V, H, W, C) — sequential in S, parallel across V.

    `use_pallas`: selects the fused VMEM-resident Pallas kernel
    (ops/pallas_twa.py, TPU + bf16 + qualifying shapes only; differentiable
    via an XLA-recompute VJP). Default None = auto: the kernel runs whenever
    supported — ~1.25x the XLA scan in isolation (53 vs 65 us/frame at
    45x80x256 bf16) and +1.5% whole-model at the S=80 serving shape
    (chip-bound 1401 vs 1380 FPS), measured never slower (docs/PERF.md). Pass
    use_pallas=False to force the scan. Anywhere the kernel is unsupported
    (CPU, f32, non-3x3 gates) the XLA scan with the hoisted input conv runs.

    Multi-chip note: the kernel carries a custom_partitioning rule that
    shards the video (V) axis — data-parallel meshes run it unmodified
    per shard. Meshes sharding seq/spatial/model axes would all-gather
    activations at the kernel boundary, so there the XLA scan is forced
    instead (parallel/steps._partitionable_model does this).
    """

    hidden_dim: int = 256
    kernel_size: int = 3
    use_bias: bool = False
    use_pallas: Optional[bool] = None

    def init_state(self, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((height, width, self.hidden_dim), dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batched = x.ndim == 5
        if not batched:
            x, state = x[None], state[None]
        v, s, h, w, cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            make_conv_init("kaiming_normal", mode="fan_out"),
            (k, k, cin + self.hidden_dim, self.hidden_dim),
        )
        bias = (
            self.param("bias", make_conv_init("zeros"), (self.hidden_dim,))
            if self.use_bias
            else None
        )
        w_x, w_h = kernel[:, :, :cin], kernel[:, :, cin:]

        # Hoisted input projection: one big conv over all V*S frames.
        gx = _conv_hwio(x.reshape(v * s, h, w, cin), w_x).reshape(
            v, s, h, w, self.hidden_dim
        )
        if bias is not None:
            gx = gx + bias

        from ..ops.pallas_twa import supports_pallas, twa_scan, twa_scan_xla

        # auto (None): the fused kernel whenever supported — it wins at every
        # measured step length chip-bound and never loses (docs/PERF.md)
        want = self.use_pallas if self.use_pallas is not None else True
        use_pallas = bool(want) and (
            jax.default_backend() == "tpu"
            and self.kernel_size == 3
            and supports_pallas(x.shape, x.dtype)
        )
        if use_pallas:
            ys, h_last = twa_scan(x, gx, w_h.astype(x.dtype), state)
        else:
            ys, h_last = twa_scan_xla(x, gx, w_h, state)
        if not batched:
            ys, h_last = ys[0], h_last[0]
        return ys, h_last


class ConvLSTM(nn.Module):
    """Full 4-gate ConvLSTM (ablation UAVSAL_LSTM; reference:
    model_convlstm.py:73-126). State is (h, c) stacked on a leading axis 2."""

    hidden_dim: int = 256
    kernel_size: int = 3
    use_bias: bool = False

    def init_state(self, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((2, height, width, self.hidden_dim), dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s, h, w, cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            make_conv_init("xavier_uniform"),
            (k, k, cin + self.hidden_dim, 4 * self.hidden_dim),
        )
        bias = (
            self.param("bias", make_conv_init("zeros"), (4 * self.hidden_dim,))
            if self.use_bias
            else None
        )
        w_x, w_h = kernel[:, :, :cin], kernel[:, :, cin:]
        gx = _conv_hwio(x, w_x)
        if bias is not None:
            gx = gx + bias

        def step(hc, inp):
            x_t, gx_t = inp
            h_prev, c_prev = hc[0], hc[1]
            gates = gx_t + _conv_hwio(h_prev[None], w_h)[0]
            ci, cf, co, cg = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(ci)
            f = jax.nn.sigmoid(cf)
            o = jax.nn.sigmoid(co)
            g = jnp.tanh(cg)
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            return jnp.stack([h_new, c_new]), h_new

        hc_last, ys = lax.scan(step, state, (x, gx))
        return ys, hc_last


class ConvSimGRU(nn.Module):
    """2-gate simplified GRU (reference: model_convlstm.py:568-625):
        i = sigmoid(.); g = tanh(.); h' = i*g + (1-i)*h
    """

    hidden_dim: int = 256
    kernel_size: int = 3
    use_bias: bool = False

    def init_state(self, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((height, width, self.hidden_dim), dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        s, h, w, cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            make_conv_init("kaiming_normal", mode="fan_out"),
            (k, k, cin + self.hidden_dim, 2 * self.hidden_dim),
        )
        bias = (
            self.param("bias", make_conv_init("zeros"), (2 * self.hidden_dim,))
            if self.use_bias
            else None
        )
        w_x, w_h = kernel[:, :, :cin], kernel[:, :, cin:]
        gx = _conv_hwio(x, w_x)
        if bias is not None:
            gx = gx + bias

        def step(h_prev, inp):
            x_t, gx_t = inp
            gates = gx_t + _conv_hwio(h_prev[None], w_h)[0]
            ci, cg = jnp.split(gates, 2, axis=-1)
            i = jax.nn.sigmoid(ci)
            g = jnp.tanh(cg)
            h_new = i * g + (1.0 - i) * h_prev
            return h_new, h_new

        h_last, ys = lax.scan(step, state, (x, gx))
        return ys, h_last


class _TWADWCell(nn.Module):
    """One ConvTWA_DW step: dwBlock gate over concat([x, h]) then lerp."""

    hidden_dim: int
    kernel_size: int

    @nn.compact
    def __call__(self, h_prev: jnp.ndarray, x_t: jnp.ndarray):
        combined = jnp.concatenate([x_t, h_prev], axis=-1)[None]
        g = DWBlock(
            self.hidden_dim,
            self.kernel_size,
            expand_ratio=4,
            res_connect=False,
            kernel_init_kwargs={"mode": "fan_out"},
            name="rnn_conv",
        )(combined, train=False)
        gate = jax.nn.sigmoid(g[0])
        h_new = gate * x_t + (1.0 - gate) * h_prev
        return h_new, h_new


class ConvTWADW(nn.Module):
    """TWA with a depthwise-separable gate (reference: model_convlstm.py:403-457).

    The gate is a dwBlock over concat([x, h]) (expand_ratio=4); its expand
    conv is not linearly separable across the concat, so the full block runs
    inside the scan via `nn.scan` (params broadcast, BN in inference mode).
    """

    hidden_dim: int = 256
    kernel_size: int = 3

    def init_state(self, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((height, width, self.hidden_dim), dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, state: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scanned = nn.scan(
            _TWADWCell,
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
        )(self.hidden_dim, self.kernel_size, name="cell")
        h_last, ys = scanned(state, x)
        return ys, h_last
