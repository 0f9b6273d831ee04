"""True-sync per-stage profiler for UAVSal on TPU.

Reports the per-frame cost of each model stage using the only timing
methodology that survives this environment (docs/PERF.md "Measurement
integrity"):

- every timed region ends in a HOST SCALAR FETCH (`float(...)`) —
  `jax.block_until_ready` returns early through the axon relay and times
  dispatch, not compute;
- each stage is timed at two batch sizes and the cost reported is the
  SLOPE (T(S2)-T(S1))/(S2-S1), so fixed overheads (relay round trip,
  dispatch, kernel launch) cancel exactly.

Usage:
    python tools/profile_stages.py [--dtype bf16|f32] [--s1 20 --s2 100]

Reference stages map to the reference implementation as follows: backbone
== model_feature.py pyramids, srfnet == model.py:110-158, trunk adds the
STBlocks (model.py:210-249), multipriors == model.py:281-324/346-365,
convtwa == model_convlstm.py:238-401, head == conv_out_st (model.py:372).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--s1", type=int, default=20)
    ap.add_argument("--s2", type=int, default=100)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

    from iip_uavsal_saliency_tpu.models.backbone import build_backbone
    from iip_uavsal_saliency_tpu.models.recurrent import ConvTWA
    from iip_uavsal_saliency_tpu.models.srfnet import SRFNet
    from iip_uavsal_saliency_tpu.models.uavsal import MultiPriors, _Trunk
    from iip_uavsal_saliency_tpu.ops.layers import DWBlock

    H, W = args.height, args.width
    HO, WO, C = H // 8, W // 8, 256
    DT = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    S1, S2 = args.s1, args.s2

    def slope(name, module, make_args, apply_fn):
        a1 = make_args(S1)
        f32 = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if getattr(a, "dtype", None) == jnp.bfloat16 else a, a1)
        vs = jax.jit(lambda k: module.init(k, *f32))(key)
        vs = jax.tree_util.tree_map(
            lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, vs)
        run = jax.jit(
            lambda vs, *a: apply_fn(module, vs, *a).astype(jnp.float32).sum())
        ts = {}
        for s, margs in ((S1, a1), (S2, make_args(S2))):
            dargs = [a for a in margs if hasattr(a, "dtype")]
            float(run(vs, *dargs))  # compile + warm (true sync)
            best = 1e9
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(run(vs, *dargs))
                best = min(best, time.perf_counter() - t0)
            ts[s] = best
        per = (ts[S2] - ts[S1]) / (S2 - S1)
        print(f"{name:30s} {per * 1e6:7.1f} us/frame   "
              f"(T{S1}={ts[S1] * 1e3:.1f} ms, T{S2}={ts[S2] * 1e3:.1f} ms)",
              flush=True)
        return per

    def mk_x(s):
        return (jnp.asarray(rng.rand(s, H, W, 3).astype(np.float32)).astype(DT),
                False)

    def mk_feats(s):
        return (jnp.asarray(rng.rand(s, HO, WO, C).astype(np.float32)).astype(DT),
                jnp.asarray(rng.rand(HO, WO, 8).astype(np.float32)).astype(DT),
                jnp.asarray(rng.rand(HO, WO, 20).astype(np.float32)).astype(DT),
                False)

    def mk_feats5(s):
        return (jnp.asarray(
            rng.rand(1, s, HO, WO, C).astype(np.float32)).astype(DT),
            jnp.zeros((1, HO, WO, C), DT))

    def mk_feats_only(s):
        return (jnp.asarray(rng.rand(s, HO, WO, C).astype(np.float32)).astype(DT),
                False)

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}; dtype {args.dtype}; "
          f"slope between S={S1} and S={S2}", file=sys.stderr, flush=True)

    slope("backbone pyramid", build_backbone("mobilenet_v2"), mk_x,
          lambda m, vs, x, *r: m.apply(vs, x, False)[-1])
    slope("srfnet (backbone+aspp)", SRFNet("mobilenet_v2", last_channel=C),
          mk_x, lambda m, vs, x, *r: m.apply(vs, x, False))
    slope("trunk (srf+2xST+fust)", _Trunk("mobilenet_v2", C, 5, 2, diff_group=None),
          mk_x, lambda m, vs, x, *r: m.apply(vs, x, False))
    slope("multipriors", MultiPriors(C, 5, (1, 1, 1), True), mk_feats,
          lambda m, vs, x, g, o, *r: m.apply(vs, x, g, o, False))
    slope("convtwa (auto)", ConvTWA(C, 3, use_bias=False), mk_feats5,
          lambda m, vs, x, h: m.apply(vs, x, h)[0])
    slope("head dwblock", DWBlock(1, 3), mk_feats_only,
          lambda m, vs, x, *r: m.apply(vs, x, False))
    print("(stage deltas: aspp = srfnet - backbone; ST blocks = trunk - srfnet)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
