"""Fused Pallas TPU kernel for the inverted-residual dwBlock (serving path).

The dwBlock (reference: model.py:74-103) is MobileNetV2's expand ->
depthwise -> project sandwich. At the flagship 45x80x256 feature maps with
expand_ratio 6, XLA executes it as three convs whose 1536-channel
intermediates (11 MB each in bf16) round-trip through HBM — true-sync
profiling (docs/PERF.md) shows the pattern costs ~100 us/frame/block for
~6 GFLOP (~3% of MXU peak): it is HBM-bound, not FLOP-bound.

This kernel computes the whole block in one VMEM pass per row chunk:

    p = project(relu6(dw3x3(relu6(expand(x))))) (+ x if residual)

with eval-mode BatchNorm folded into the conv weights/biases by the caller
(`fold_conv_bn`). The expanded activations never touch HBM.

Structure (grid = (N, H/rb), all-parallel, no cross-step state):
- the input is host-padded to (N, H+2, PW, C) (zero borders ARE the dw
  conv's padding; PW rounds W+2 up to the 8-sublane tile) and stays in HBM;
  each block DMAs its (rb+2)-row window (1-row halo, recomputed by
  neighbours — 2/rb overhead) into VMEM.
- the expanded dim E is processed in chunks of <=512 channels: per chunk,
  expand matmul -> relu6 -> store into a zero-padded VMEM buffer -> 9
  shifted VPU taps for the depthwise conv (dx offsets are reads, which
  Mosaic allows at sublane offsets; the zero halo columns come from the
  padded store) -> relu6 -> partial project matmul accumulated in f32.
  Chunking bounds VMEM at ~9 MB for any E.
- matmuls run on the MXU in bf16 with f32 accumulation; the depthwise taps
  are VPU fma's.

Differentiable via a custom VJP that recomputes through the XLA reference
(`dwblock_ref`) — serving never differentiates, training uses the unfused
flax path (train-mode BN can't fold).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_twa import _round_up, _row_block  # shared tiling helpers

# Run pallas_call in interpreter mode (CPU tests). Deliberately a separate
# flag from pallas_twa.INTERPRET: tests flip each kernel independently.
INTERPRET = False


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def fold_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BatchNorm into a conv kernel: returns (kernel', bias').

    y = (conv(x) - mean) * scale / sqrt(var + eps) + bias
      = conv(x) * s + (bias - mean * s),  s = scale / sqrt(var + eps)

    kernel: HWIO (any spatial dims); fold scales the output-channel axis.
    """
    s = bn_scale * lax.rsqrt(bn_var + eps)
    return kernel * s, bn_bias - bn_mean * s


def dwblock_ref(x, w1, b1, wd, bd, w2, b2, residual: bool):
    """XLA reference of the fused block (also the VJP recompute path).

    x: (N,H,W,C); w1: (C,E); b1: (E,); wd: (3,3,E); bd: (E,);
    w2: (E,Co); b2: (Co,).
    """
    e = _relu6(
        lax.dot_general(x, w1, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    ).astype(x.dtype)
    d = lax.conv_general_dilated(
        e, wd[:, :, None, :], window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wd.shape[-1],
        preferred_element_type=jnp.float32,
    )
    d = _relu6(d + bd.astype(jnp.float32)).astype(x.dtype)
    p = lax.dot_general(d, w2, (((3,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    p = p + b2.astype(jnp.float32)
    if residual:
        p = p + x.astype(jnp.float32)
    return p.astype(x.dtype)


def _e_chunk(e: int, max_ec: int = 512) -> Optional[int]:
    """Largest 128-multiple chunk <= max_ec dividing e (e must be a multiple
    of 128 — pad first). Lane-dim VMEM slices must be 128-aligned."""
    if e % 128 != 0:
        return None
    for ec in range((max_ec // 128) * 128, 0, -128):
        if e % ec == 0:
            return ec
    return None




def _dwb_kernel(xp_ref, w1_ref, b1_ref, wd_ref, bd_ref, w2_ref, b2_ref,
                out_ref, xwin, ebuf, sem, *, rb, W, C, E, EC, Co, PW,
                residual):
    n = pl.program_id(0)
    k = pl.program_id(1)
    r0 = k * rb

    dma = pltpu.make_async_copy(xp_ref.at[n, pl.ds(r0, rb + 2)], xwin, sem)
    dma.start()
    dma.wait()

    xin = xwin[:, 1 : 1 + W, :]  # (rb+2, W, C) real columns
    x2d = xin.reshape((rb + 2) * W, C)

    p_acc = jnp.zeros((rb * W, Co), jnp.float32)
    for c0 in range(0, E, EC):
        e = jnp.dot(x2d, w1_ref[:, c0 : c0 + EC],
                    preferred_element_type=jnp.float32)
        e = _relu6(e + b1_ref[0, c0 : c0 + EC].astype(jnp.float32))
        e = e.reshape(rb + 2, W, EC).astype(ebuf.dtype)
        # zero halo columns are written as part of the full-width store
        # (Mosaic rejects stores at sublane offsets, same trick as the TWA
        # kernel); they ARE the dw conv's zero padding.
        ebuf[...] = jnp.pad(e, ((0, 0), (1, PW - W - 1), (0, 0)))
        # at image top/bottom the halo row was computed from zero-padded x,
        # giving relu6(b1) != 0 — the dw conv needs ZERO e-padding there
        nk = pl.num_programs(1)

        @pl.when(k == 0)
        def _zero_top():
            ebuf[0] = jnp.zeros((PW, EC), ebuf.dtype)

        @pl.when(k == nk - 1)
        def _zero_bottom():
            ebuf[rb + 1] = jnp.zeros((PW, EC), ebuf.dtype)
        acc = jnp.zeros((rb, W, EC), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + (
                    ebuf[dy : dy + rb, dx : dx + W, :].astype(jnp.float32)
                    * wd_ref[dy, dx, c0 : c0 + EC].astype(jnp.float32)
                )
        d = _relu6(acc + bd_ref[0, c0 : c0 + EC].astype(jnp.float32))
        d = d.reshape(rb * W, EC).astype(xwin.dtype)
        p_acc = p_acc + jnp.dot(d, w2_ref[c0 : c0 + EC, :],
                                preferred_element_type=jnp.float32)

    p_acc = p_acc + b2_ref[0].astype(jnp.float32)
    if residual:
        p_acc = p_acc + xin[1 : 1 + rb].astype(jnp.float32).reshape(rb * W, C)
    out_ref[0] = p_acc.reshape(rb, W, Co).astype(out_ref.dtype)


def fused_dwblock_pallas(x, w1, b1, wd, bd, w2, b2, residual: bool,
                         *, interpret: Optional[bool] = None):
    """Fused inverted-residual block. Shapes as in `dwblock_ref`.

    Mosaic needs 128-aligned lane (channel) slices, so C and E are zero-
    padded up to multiples of 128 here: padded input channels multiply zero
    w1 rows, and padded E channels (even though relu6(b1-pad)=0 anyway)
    multiply zero w2 rows — both contribute exactly nothing.
    """
    n, h, w, c = x.shape
    e = w1.shape[1]
    co = w2.shape[1]
    rb = _row_block(h)
    if interpret is None:
        interpret = INTERPRET

    cp = _round_up(c, 128)
    ep = _round_up(e, 128)
    ec = _e_chunk(ep)
    if rb is None or ec is None:
        raise ValueError(f"unsupported shape H={h} E={e}; use dwblock_ref")
    co_trim = None
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
        w1 = jnp.pad(w1, ((0, cp - c), (0, 0)))
        if residual:  # residual implies co == c: pad the output to match
            w2 = jnp.pad(w2, ((0, 0), (0, cp - co)))
            b2 = jnp.pad(b2, (0, cp - co))
            co_trim = co
            co = cp
    if ep != e:
        w1 = jnp.pad(w1, ((0, 0), (0, ep - e)))
        b1 = jnp.pad(b1, (0, ep - e))
        wd = jnp.pad(wd, ((0, 0), (0, 0), (0, ep - e)))
        bd = jnp.pad(bd, (0, ep - e))
        w2 = jnp.pad(w2, ((0, ep - e), (0, 0)))
    c, e = cp, ep

    pw = _round_up(w + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, pw - w - 1), (0, 0)))

    kernel = functools.partial(
        _dwb_kernel, rb=rb, W=w, C=c, E=e, EC=ec, Co=co, PW=pw,
        residual=bool(residual),
    )
    flops = 2 * n * h * w * (c * e + 9 * e + e * co)
    out = pl.pallas_call(
        kernel,
        grid=(n, h // rb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, DMA'd per block
            pl.BlockSpec((c, e), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, e), lambda i, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e, co), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, w, co), lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rb + 2, pw, c), x.dtype),
            pltpu.VMEM((rb + 2, pw, ec), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(n * h * w * (c + co) + c * e + e * co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w1, b1.reshape(1, -1), wd, bd.reshape(1, -1), w2, b2.reshape(1, -1))
    return out if co_trim is None else out[..., :co_trim]


def supports_fused_dwblock(x_shape, dtype, kernel_size: int, stride: int,
                           dilation: int, expand: int, features: int,
                           residual: bool = False) -> bool:
    """Kernel applicability: bf16, 3x3 stride-1 undilated, shapes tile."""
    if jnp.dtype(dtype) != jnp.dtype(jnp.bfloat16):
        return False
    if kernel_size != 3 or stride != 1 or dilation != 1:
        return False
    n, h, w, c = x_shape
    e = int(round(c * expand))
    cp = _round_up(c, 128)
    ep = _round_up(e, 128)
    rb = _row_block(h)
    ec = _e_chunk(ep)
    if rb is None or ec is None or expand == 1:
        return False
    if c < 64 or e < 128:  # tiny blocks: XLA's fused path is already fine
        return False
    # narrow outputs (e.g. the 1-channel head) have only been validated in
    # interpreter mode; Mosaic lane tiling of the (E, features) w2 block
    # needs a full 128-lane output tile on real TPU. Residual blocks are
    # exempt: co == c there and fused_dwblock_pallas pads both to the full
    # 128-lane tile (the co_trim path), so the stored w2 block is aligned.
    if features % 128 != 0 and not residual:
        return False
    pw = _round_up(w + 2, 8)
    itemsize = 2
    vmem = (
        (rb + 2) * pw * cp * itemsize         # input window
        + (rb + 2) * pw * ec * itemsize       # expanded chunk
        + rb * w * ec * 4                     # dw accumulator (f32)
        + rb * w * max(features, cp) * 4      # project accumulator (f32)
        + (cp * ep + 3 * 3 * ep + ep * features) * itemsize  # weights
    )
    return vmem < 10 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_dwblock(x, w1, b1, wd, bd, w2, b2, residual: bool):
    """Differentiable fused dwBlock: Pallas forward, XLA-recompute backward."""
    return fused_dwblock_pallas(x, w1, b1, wd, bd, w2, b2, residual)


def _fwd(x, w1, b1, wd, bd, w2, b2, residual):
    out = fused_dwblock_pallas(x, w1, b1, wd, bd, w2, b2, residual)
    return out, (x, w1, b1, wd, bd, w2, b2)


def _bwd(residual, res, g):
    x, w1, b1, wd, bd, w2, b2 = res
    _, vjp = jax.vjp(
        lambda x, w1, b1, wd, bd, w2, b2: dwblock_ref(
            x, w1, b1, wd, bd, w2, b2, residual
        ),
        x, w1, b1, wd, bd, w2, b2,
    )
    return vjp(g)


fused_dwblock.defvjp(_fwd, _bwd)
