"""Probe: dilated depthwise 3x3 conv vs an exact shift-add reformulation.

The ASPP branches run depthwise 3x3 convs at dilation 6/12/18 over the
expanded 23x40x1920 tensor (models/srfnet.py; reference rates at
model.py:123). At dilation 18 on a 23-row grid, the +-1-row taps overlap
the input in only 5 of 23 output rows — the conv is almost entirely a
per-channel SCALE (the center tap) plus two thin shifted slabs. The
shift-add form computes exactly that:

    y = sum_{di,dj} w[di+1, dj+1] * shift(x, di*d, dj*d)   (zero fill)

which is 9 elementwise FMAs on progressively tiny slices instead of a
conv with (d,d)x(d,d) padding. This tool measures both at the real ASPP
shape with the true-sync slope method (docs/PERF.md "Measurement
integrity") and checks exactness.

    python tools/probe_dilated_dw.py [--dtype bf16] [--s1 20 --s2 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dw_conv(x, k, d):
    """The production form: lax dilated depthwise conv, SAME-style pad."""
    from jax import lax

    c = x.shape[-1]
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(d, d), (d, d)],
        rhs_dilation=(d, d), feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def dw_shift_add(x, k, d):
    """Exact shift-add: center tap is a per-channel scale over the full
    tensor; the 8 neighbor taps touch only the rows/cols within d of the
    opposite edge (empty when d >= H or W)."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    kk = k.reshape(3, 3, c)  # (kh, kw, 1, C) -> taps
    y = x * kk[1, 1]
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            sh, sw = di * d, dj * d
            # output[i, j] += w * x[i + sh, j + sw] where in bounds
            oi0, ii0 = max(0, -sh), max(0, sh)
            oj0, ij0 = max(0, -sw), max(0, sw)
            hh, ww = h - abs(sh), w - abs(sw)
            if hh <= 0 or ww <= 0:
                continue
            patch = x[:, ii0:ii0 + hh, ij0:ij0 + ww, :] * kk[di + 1, dj + 1]
            y = y.at[:, oi0:oi0 + hh, oj0:oj0 + ww, :].add(patch)
    return y


def dw_pad_add(x, k, d):
    """Same math, expressed as zero-pad + add (no scatter): every term is
    a full-size elementwise tensor XLA can fuse into one add tree."""
    import jax.numpy as jnp

    n, h, w, c = x.shape
    kk = k.reshape(3, 3, c)
    terms = [x * kk[1, 1]]
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            sh, sw = di * d, dj * d
            oi0, ii0 = max(0, -sh), max(0, sh)
            oj0, ij0 = max(0, -sw), max(0, sw)
            hh, ww = h - abs(sh), w - abs(sw)
            if hh <= 0 or ww <= 0:
                continue
            patch = x[:, ii0:ii0 + hh, ij0:ij0 + ww, :] * kk[di + 1, dj + 1]
            terms.append(jnp.pad(
                patch,
                ((0, 0), (oi0, h - oi0 - hh), (oj0, w - oj0 - ww), (0, 0))))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--s1", type=int, default=20)
    ap.add_argument("--s2", type=int, default=100)
    ap.add_argument("--height", type=int, default=23)
    ap.add_argument("--width", type=int, default=40)
    ap.add_argument("--channels", type=int, default=1920)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    from iip_uavsal_saliency_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; "
          f"{args.height}x{args.width}x{args.channels}", file=sys.stderr)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(3, 3, 1, args.channels).astype(np.float32), dt)

    # exactness first (f32, all three rates): both forms must equal the conv
    for d in (6, 12, 18):
        xs = jnp.asarray(
            rng.randn(2, args.height, args.width, args.channels).astype(np.float32))
        a = np.asarray(dw_conv(xs, k.astype(jnp.float32), d))
        for name, fn in (("shift-add", dw_shift_add), ("pad-add", dw_pad_add)):
            b = np.asarray(jax.jit(fn, static_argnums=2)(
                xs, k.astype(jnp.float32), d))
            err = float(np.abs(a - b).max())
            print(f"d={d} {name}: exactness |delta|max = {err:.2e}",
                  file=sys.stderr)
            assert err < 1e-4, f"{name} diverges from the conv"

    def slope(fn, d):
        f = jax.jit(fn, static_argnums=2)
        ts = {}
        for s in (args.s1, args.s2):
            x = jnp.asarray(
                rng.randn(s, args.height, args.width, args.channels)
                .astype(np.float32), dt)
            y = f(x, k, d)
            float(y.astype(jnp.float32).sum())  # compile + sync
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                y = f(x, k, d)
                float(y.astype(jnp.float32).sum())
                best = min(best, time.perf_counter() - t0)
            ts[s] = best
        return (ts[args.s2] - ts[args.s1]) / (args.s2 - args.s1) * 1e6, ts

    for d in (6, 12, 18):
        us_conv, t_conv = slope(dw_conv, d)
        us_sa, _ = slope(dw_shift_add, d)
        us_pa, _ = slope(dw_pad_add, d)
        print(f"d={d:2d}: conv {us_conv:7.2f} us/frame   "
              f"shift-add {us_sa:7.2f} us/frame   "
              f"pad-add {us_pa:7.2f} us/frame")


if __name__ == "__main__":
    main()
