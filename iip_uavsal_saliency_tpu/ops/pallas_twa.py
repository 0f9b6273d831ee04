"""Fused Pallas TPU kernel for the ConvTWA recurrence.

The TWA cell (reference: model_convlstm.py:276-292) is

    i_t = sigmoid(conv([x_t, h_{t-1}], W))
    h_t = i_t * x_t + (1 - i_t) * h_{t-1}

With the input half of the gate conv hoisted out of the recurrence
(gx_t = conv(x_t, W_x), computed for all frames in one batched conv — see
models/recurrent.py), the sequential part per step is

    h_t = lerp(h_{t-1}, x_t, sigmoid(gx_t + conv(h_{t-1}, W_h)))

At the flagship config (45x80 spatial, 256 channels) the 3x3 256->256
hidden conv is ~4.2 GFLOP/frame — the hottest op in the whole model. The
XLA `lax.scan` version round-trips h (and the conv temporaries) through HBM
every step. This kernel keeps h resident in VMEM for the entire scan:

- grid (V, S, H/RB): videos outer, frames middle, row-chunks inner (TPU
  grids run sequentially, so VMEM scratch carries state across steps).
- h lives in a (2, H+2, W+2, C) zero-padded ping-pong scratch: reads at
  step s come from slot s%2, writes go to slot (s+1)%2, so every row chunk
  of step s sees the unmodified h_{s-1} (including halo rows) with no
  boundary masking — the padding rows ARE the conv zero-padding.
- the 3x3 conv is computed as a partial im2col: per dx tap, the three
  dy-shifted windows concat on channels into one (RB*W, 3C) x (3C, C) MXU
  matmul (3 matmuls total), accumulated in f32.
- x_t / gx_t stream in as (RB, W, C) blocks; h_t streams out through the
  ys output (the final frame's ys row IS the carried state, so no separate
  h_last output is needed).

The kernel is used for inference/serving; for training, `twa_scan` wraps it
in a custom_vjp whose backward recomputes through the XLA scan in the INPUT
dtype (bf16 on every kernel-eligible path). The kernel's forward accumulates
in f32 before storing bf16, so the recomputed forward matches it to bf16
rounding, not bit-exactly — gradient parity is bounded by the tests, not by
an exactness guarantee.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_hwio(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """NHWC 'same' conv with an HWIO kernel (stride 1). Shared with
    models/recurrent.py — the cells and this kernel's VJP recompute must
    compute the identical conv."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def twa_scan_xla(x: jnp.ndarray, gx: jnp.ndarray, w_h: jnp.ndarray,
                 h0: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference XLA implementation. x, gx: (V,S,H,W,C); h0: (V,H,W,C)."""

    def one_video(xv, gxv, h0v):
        def step(h_prev, inp):
            x_t, gx_t = inp
            gate = jax.nn.sigmoid(gx_t + _conv_hwio(h_prev[None], w_h)[0])
            h_new = gate * x_t + (1.0 - gate) * h_prev
            return h_new, h_new

        h_last, ys = lax.scan(step, h0v, (xv, gxv))
        return ys, h_last

    return jax.vmap(one_video)(x, gx, h0)


# Run pallas_call in interpreter mode (CPU tests). Checked at trace time by
# twa_scan_pallas when its `interpret` argument is None.
INTERPRET = False


def _row_block(h: int, max_rb: int = 16) -> Optional[int]:
    """Largest divisor of h that is <= max_rb (None if only 1 divides)."""
    for rb in range(min(h, max_rb), 1, -1):
        if h % rb == 0:
            return rb
    return None


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _twa_kernel(x_ref, gx_ref, w_ref, h0_ref, ys_ref, h_pp, sem, *, rb, W, C, PW):
    s = pl.program_id(1)
    k = pl.program_id(2)
    cur = s % 2
    nxt = (s + 1) % 2
    v = pl.program_id(0)

    @pl.when(jnp.logical_and(s == 0, k == 0))
    def _init():
        # Zero slot 1 (borders double as conv zero-padding; slot 0's borders
        # come in pre-zeroed), then DMA this video's host-padded h0 into
        # slot 0. The copy is a full (H+2, W+2, C) slice — DMA destinations
        # with sublane-unaligned offsets fail Mosaic's tiling proof.
        h_pp[1] = jnp.zeros_like(h_pp[1])
        dma = pltpu.make_async_copy(h0_ref.at[v], h_pp.at[0], sem)
        dma.start()
        dma.wait()

    r0 = k * rb
    # h_{s-1} window for this chunk: rows r0..r0+rb+2 of the padded buffer
    # cover output rows r0..r0+rb with their +/-1 halo; same in W.
    win = h_pp[cur, pl.ds(r0, rb + 2), :, :]  # (rb+2, PW, C)

    # Partial im2col over dy: for each dx, the three dy-shifted windows are
    # concatenated on channels -> one (rb*W, 3C) x (3C, C) matmul. dy shifts
    # index the UNTILED leading dim, so (unlike dx/sublane shifts) Mosaic
    # accepts the concat; 3 K=3C matmuls beat 9 K=C matmuls on the MXU.
    acc = jnp.zeros((rb * W, C), jnp.float32)
    for dx in range(3):
        tap = jnp.concatenate(
            [win[dy : dy + rb, dx : dx + W, :] for dy in range(3)], axis=-1
        ).reshape(rb * W, 3 * C)
        acc = acc + jnp.dot(tap, w_ref[dx], preferred_element_type=jnp.float32)

    gx_t = gx_ref[0, 0].astype(jnp.float32).reshape(rb * W, C)
    x_t = x_ref[0, 0].astype(jnp.float32).reshape(rb * W, C)
    h_prev = win[1 : 1 + rb, 1 : 1 + W, :].astype(jnp.float32).reshape(rb * W, C)
    gate = jax.nn.sigmoid(acc + gx_t)
    h_new = (gate * x_t + (1.0 - gate) * h_prev).reshape(rb, W, C).astype(ys_ref.dtype)

    ys_ref[0, 0] = h_new
    # Full-width store at an aligned W offset: Mosaic cannot prove
    # tile-alignment of a dynamic offset-1 slice in the sublane dim, so the
    # zero halo columns are written as part of the row block instead.
    h_pp[nxt, pl.ds(1 + r0, rb), :, :] = jnp.pad(
        h_new, ((0, 0), (1, PW - W - 1), (0, 0))
    )


def twa_scan_pallas(x: jnp.ndarray, gx: jnp.ndarray, w_h: jnp.ndarray,
                    h0: jnp.ndarray, *, interpret: Optional[bool] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused TWA scan. x, gx: (V,S,H,W,C); w_h: (3,3,C,C); h0: (V,H,W,C).

    Returns (ys, h_last) with ys[v, s] = h_s. Requires a row-chunk divisor
    of H (see `supports_pallas`).
    """
    v, s, h, w, c = x.shape
    rb = _row_block(h)
    if rb is None:
        raise ValueError(f"H={h} has no row-block divisor; use twa_scan_xla")
    n_chunks = h // rb
    if interpret is None:
        interpret = INTERPRET

    # normalize dtypes at the kernel boundary: a caller passing the model's
    # default f32 init_state (or f32 master weights) alongside bf16 streams
    # would otherwise fail the init DMA with a Mosaic dtype error
    h0 = h0.astype(x.dtype)
    w_h = w_h.astype(x.dtype)

    # Halo-padded h0 (zero borders ARE the conv zero-padding); done on the
    # host so the kernel's init DMA is a full aligned slice. The padded width
    # rounds up to the 8-sublane tile (DMA slice shapes must be tile-aligned).
    pw = _round_up(w + 2, 8)
    h0 = jnp.pad(h0, ((0, 0), (1, 1), (1, pw - w - 1), (0, 0)))

    # (3,3,C,C)[dy,dx] -> (3,3C,C)[dx]: per-dx weights with the three dy taps
    # stacked dy-major on input channels (matches the kernel's tap concat)
    w_h = jnp.swapaxes(w_h, 0, 1).reshape(3, 3 * c, c)

    kernel = functools.partial(_twa_kernel, rb=rb, W=w, C=c, PW=pw)
    ys = pl.pallas_call(
        kernel,
        grid=(v, s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, rb, w, c), lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rb, w, c), lambda i, j, k: (i, j, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * c, c), lambda i, j, k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # h0 stays in HBM, DMA'd once
        ],
        out_specs=pl.BlockSpec((1, 1, rb, w, c), lambda i, j, k: (i, j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, s, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, h + 2, pw, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * v * s * 9 * h * w * c * c,
            bytes_accessed=(3 * v * s * h * w * c + 9 * c * c) * x.dtype.itemsize,
            transcendentals=v * s * h * w * c,
        ),
        interpret=interpret,
    )(x, gx, w_h, h0)
    return ys, ys[:, -1]


def supports_pallas(x_shape, dtype) -> bool:
    """Kernel applicability: TPU-friendly dtype, lane-aligned channels,
    divisible rows, VMEM fit. Anything rejected falls back to the
    partitionable XLA scan (never a compile error)."""
    v, s, h, w, c = x_shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    rb = _row_block(h)
    if rb is None:
        return False
    # the dy-tap concat and the (rb*W, 3C) im2col reshape index the lane
    # (channel) axis: C must be a full 128-lane multiple or Mosaic rejects
    # the tile boundaries at compile time
    if c % 128 != 0:
        return False
    # ping-pong state + streamed blocks must fit ~16MB VMEM. Budget with
    # the ALLOCATED padded width (sublane rounds up to 8), not the logical
    # w+2 — narrow inputs otherwise pass the gate and then fail Mosaic
    # compilation instead of falling back to the XLA scan
    pw = _round_up(w + 2, 8)
    state_bytes = 2 * (h + 2) * pw * c * 2
    kern_bytes = 9 * c * c * 2
    block_bytes = 6 * rb * w * c * 2  # x/gx/ys double-buffered
    return state_bytes + kern_bytes + block_bytes < 12 * 1024 * 1024


# --------------------------------------------------------------------------- #
# GSPMD partitioning: the pallas_call lowers to a custom call XLA cannot
# partition by itself, so under a >1-device mesh a sharded jit over the raw
# kernel fails. `twa_scan_sharded` registers a custom_partitioning rule: the
# scan is embarrassingly parallel over videos (V, dim 0), so V-sharded
# operands run the unmodified kernel per-shard; every other dim is declared
# replicated at the call boundary (GSPMD inserts the reshard — correct, but
# an all-gather, so callers on seq/spatial-sharded meshes should prefer the
# partitionable XLA scan; see parallel/steps._partitionable_model).


def _dim0_spec(arg_info):
    """Mesh axes sharding dim 0 of an operand (None if unsharded)."""
    spec = getattr(arg_info.sharding, "spec", None)
    if spec is None or len(spec) == 0:
        return None
    return spec[0]


def _twa_infer_sharding(mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P

    v = _dim0_spec(arg_infos[0])
    return (
        NamedSharding(mesh, P(v, None, None, None, None)),
        NamedSharding(mesh, P(v, None, None, None)),
    )


def _twa_partition(mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P

    v = _dim0_spec(arg_infos[0])
    if v is not None:
        names = (v,) if isinstance(v, str) else tuple(v)
        axis_size = 1
        for n in names:
            axis_size *= mesh.shape[n]
        if axis_size <= 0 or arg_infos[0].shape[0] % axis_size != 0:
            v = None  # uneven split: replicate (each shard runs the full batch)
    x5 = NamedSharding(mesh, P(v, None, None, None, None))
    x4 = NamedSharding(mesh, P(v, None, None, None))
    rep = NamedSharding(mesh, P(None, None, None))

    def lower(x, gx, w_h, h0):
        return twa_scan_pallas(x, gx, w_h, h0)

    return mesh, lower, (x5, x4), (x5, x5, rep, x4)


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402


@custom_partitioning
def twa_scan_sharded(x, gx, w_h, h0):
    return twa_scan_pallas(x, gx, w_h, h0)


twa_scan_sharded.def_partition(
    infer_sharding_from_operands=_twa_infer_sharding,
    partition=_twa_partition,
    # Shardy propagation rule: the video factor `v` is the ONLY factor shared
    # between operands and results (result dims use fresh factor names), so
    # only dim-0 shardings propagate through the op — matching the GSPMD
    # infer_sharding_from_operands above. A seq/spatial sharding on x stays
    # on x and is resolved by _twa_partition's forced reshard.
    sharding_rule="v s h w c, v s2 h2 w2 c2, k1 k2 ci co, v h3 w3 c3 "
                  "-> v s4 h4 w4 c4, v h5 w5 c5",
)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def twa_scan(x, gx, w_h, h0):
    """Differentiable fused TWA scan: Pallas forward (with the V-axis GSPMD
    partitioning rule), XLA-recompute backward."""
    ys, h_last = twa_scan_sharded(x, gx, w_h, h0)
    return ys, h_last


def _twa_fwd(x, gx, w_h, h0):
    out = twa_scan_sharded(x, gx, w_h, h0)
    return out, (x, gx, w_h, h0)


def _twa_bwd(res, g):
    x, gx, w_h, h0 = res
    _, vjp = jax.vjp(twa_scan_xla, x, gx, w_h, h0)
    return vjp(g)


twa_scan.defvjp(_twa_fwd, _twa_bwd)
