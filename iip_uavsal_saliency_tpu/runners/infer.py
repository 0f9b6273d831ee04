"""Resumable per-video saliency inference.

TPU-native equivalent of the reference's test() driver
(reference: Demo_Test.py:30-95):

- loop sorted *.avi/*.mp4 in the input dir, skip when the output .mat exists
  (video-level resumability);
- decode + letterbox all frames, truncate to a multiple of time_dims;
- clip loop with carried recurrent state (reset per video);
- un-letterbox each prediction to native resolution, max-normalize to uint8;
- write `{'salmap': (H, W, 1, T) uint8}` MATLAB v7.3 files.

TPU pipeline details:
- frames go to the device as uint8 (normalize fused on-chip,
  parallel/steps.make_infer_step);
- the clip loop is an explicit 3-stage software pipeline: while step k
  computes, clip k+1 is already shipping host->HBM (`jax.device_put` double
  buffer) and step k-1's saliency is being pulled back and scattered — the
  relay/PCIe link and the chip overlap instead of alternating. The recurrent
  state buffer is donated (overwritten in place every step);
- ragged final clips are right-padded (extra frames sliced off on the host),
  so a single compiled program serves the whole run.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.letterbox import im2uint8, postprocess_prediction
from ..data.matio import savemat
from ..data.priors import get_gauss_priors, get_ob_priors
from ..data.video import preprocess_videos
from ..models import UAVSal
from ..parallel.steps import make_infer_step
from ..training.checkpoint import load_checkpoint
from ..utils.logging import get_logger

log = get_logger("infer")

VIDEO_EXTS = (".avi", ".AVI", ".mp4")


def load_model_for_inference(
    model_path: str,
    cnn_type: str = "mobilenet_v2",
    time_dims: int = 5,
    num_stblock: int = 2,
    bias_type: Sequence[int] = (1, 1, 1),
    model_name: str = "uavsal",
    st_type: str = "st",
    fold_bn: bool = True,
    s2d_stem: bool = False,
):
    """Build the model + restore a checkpoint written by the Trainer (or by
    the torch converter in models/convert.py). `model_name` accepts any
    MODEL_ZOO name: ablation checkpoints load behind the same stateful
    adapter the Trainer used, so `test` serves every variant. `st_type`
    selects the ordering for uavsal_stblocks_type checkpoints.

    `fold_bn` (default on) folds every eval-mode BatchNorm into its conv at
    load time (ops/fold.fold_batchnorm): same tree structure, identical
    outputs to ~1e-5 in f32, and the serving graph's BN math degenerates to
    an add. Serving-only — pass the raw checkpoint to the Trainer instead."""
    if model_name.lower() == "uavsal":
        model = UAVSal(
            cnn_type=cnn_type, time_dims=time_dims,
            num_stblock=num_stblock, bias_type=bias_type,
            s2d_stem=s2d_stem,  # exact stem reparam; same checkpoint tree
        )
    else:
        if s2d_stem:
            # loud, like build_backbone's non-MBV2 guard: silently serving
            # the plain stem would mis-attribute any A/B the flag was for
            raise NotImplementedError(
                "s2d_stem is only implemented for the flagship 'uavsal' "
                f"model (got model_name={model_name!r})"
            )
        from ..models import build_adapted_model

        model = build_adapted_model(
            model_name, filter_kwargs=True, cnn_type=cnn_type,
            time_dims=time_dims, num_stblock=num_stblock,
            bias_type=bias_type, st_type=st_type,
        )
    ckpt = load_checkpoint(model_path)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    if fold_bn:
        from ..ops.fold import fold_batchnorm

        variables = fold_batchnorm(variables)
    return model, variables


def test_videos(
    input_path: str,
    output_path: str,
    model,
    variables,
    iosize: Tuple[int, int, int, int] = (360, 640, 45, 80),
    batch_size: int = 4,
    time_dims: int = 5,
    bias_type: Sequence[int] = (1, 1, 1),
    save_frames: float = float("inf"),
    train_data_dir: str = "",
    dataset: str = "",
    priors_cache_dir: str = "",
    method_name: Optional[str] = None,
    videos_per_batch: int = 1,
    compute_dtype=None,
    mesh=None,
    infer_step=None,
    bake_params: bool = True,
) -> None:
    """Run saliency prediction over every video in `input_path`.

    `videos_per_batch > 1` streams V videos in lock-step through the model's
    V axis. At the tuned S=80 serving shape this is NOT an aggregate-FPS win
    (measured V=1/2/4/8 -> 1337/1268/1319/1344 FPS streaming, docs/PERF.md
    round 4): its value is amortizing HOST-side work — one decode prefetch,
    one clip-build, and one dispatch serve V videos — and filling the chip
    at small S. Shorter videos in a group are right-padded with repeated
    frames and their padding sliced off on the host.
    `compute_dtype=jnp.bfloat16` selects the bf16 serving path.

    `mesh`: a jax Mesh for MULTI-CHIP serving — a pure-'data' mesh shards
    the V axis over chips via make_infer_step's shard_map branch (each chip
    runs the complete single-device program on its own videos, zero
    collectives; the fused Pallas TWA kernel runs unmodified per chip).
    Requires videos_per_batch % mesh.shape['data'] == 0. CLI: --dp_devices.

    `infer_step`: a pre-built `(params, batch_stats, x, gauss, ob, state)
    -> (sal, state)` step that replaces make_infer_step — used by the AOT
    serving path (runners/export.run_exported), whose step has the weights
    and priors baked into the artifact. Mutually exclusive with `mesh`.

    `bake_params` (default on): embed params/stats/priors as compile-time
    CONSTANTS in the serving program instead of passing them as arguments —
    XLA folds the eval-BN affines and precomputes the constant-prior conv
    stack; measured +11.7% FPS at the tuned serving shape
    (parallel/steps.make_baked_infer_step). Composes with a pure-'data'
    mesh (the baked program runs per device under shard_map); meshes that
    shard other axes fall back to the argument-passing GSPMD step. Outputs
    match the argument-passing step to f32 rounding (tests/test_pipeline.py).
    """
    if infer_step is not None and mesh is not None:
        raise ValueError("pass either a pre-built infer_step or a mesh, not both")
    if method_name:
        output_path = os.path.join(output_path, method_name)
    os.makedirs(output_path, exist_ok=True)

    shape_r, shape_c, shape_r_out, shape_c_out = iosize
    gauss = (
        jnp.asarray(get_gauss_priors(shape_r_out, shape_c_out, 8, priors_cache_dir))
        if bias_type[0]
        else None
    )
    ob = (
        jnp.asarray(
            get_ob_priors(train_data_dir, dataset, "train", shape_r_out, shape_c_out, 20,
                          priors_cache_dir)
        )
        if bias_type[1]
        else None
    )
    if compute_dtype is not None:
        cast = lambda a: a.astype(compute_dtype) if a is not None else None  # noqa: E731
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a, variables
        )
        gauss, ob = cast(gauss), cast(ob)

    v_per = max(1, videos_per_batch)
    from ..parallel.steps import _data_only_mesh

    # decided up front: the baked branch snapshots variables/priors to HOST
    # np literals, so replicating them to the mesh first would be a wasted
    # ~2x26 MB round trip (seconds through the relay)
    use_baked = (infer_step is None and bake_params
                 and (mesh is None or _data_only_mesh(mesh)))
    x_sharding = state_sharding = None
    if mesh is not None:
        n_data = dict(mesh.shape).get("data", 1)
        if v_per % max(n_data, 1):
            raise ValueError(
                f"videos_per_batch={v_per} must be a multiple of the mesh "
                f"'data' axis ({n_data}) so the video batch shards evenly"
            )
        from ..parallel.mesh import data_sharding, replicated
        from ..parallel.steps import _state_sharding

        x_sharding = data_sharding(mesh, 5)
        state_sharding = _state_sharding(model, mesh)
        if not use_baked:
            rep = replicated(mesh)
            # params/priors replicate once up front; clips/state are placed
            # per step below so the shard_map program never reshards on the
            # fly (the baked step instead embeds them as constants)
            variables = jax.device_put(variables, rep)
            gauss = None if gauss is None else jax.device_put(gauss, rep)
            ob = None if ob is None else jax.device_put(ob, rep)

    injected_step = infer_step is not None  # AOT step: V is baked into it
    if infer_step is None:
        if use_baked:
            # baked-constant serving composes with multi-chip DP: a pure
            # 'data' mesh runs the baked per-device program under shard_map
            # (constants replicate at compile time), so DP serving sheds the
            # same per-dispatch buffer marshalling as single-chip (+11.7%)
            from ..parallel.steps import make_baked_infer_step

            baked = make_baked_infer_step(
                model, variables, gauss=gauss, ob=ob, mesh=mesh,
                compute_dtype=compute_dtype, donate_state=True,
            )
            infer_step = lambda p, b, x, g, o, st: baked(x, st)  # noqa: E731
        else:
            infer_step = make_infer_step(model, mesh=mesh,
                                         compute_dtype=compute_dtype,
                                         donate_state=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    file_names = [
        f for f in sorted(os.listdir(input_path)) if f.endswith(VIDEO_EXTS)
        # resumable (reference: Demo_Test.py:60-62)
        and not os.path.exists(os.path.join(output_path, os.path.splitext(f)[0] + ".mat"))
    ]
    s = batch_size * time_dims

    def _decode_group(group):
        decoded = []
        for name in group:
            vidimgs, nframes, height, width = preprocess_videos(
                os.path.join(input_path, name), shape_r, shape_c, save_frames,
                mode="RGB", normalize=False,
            )
            total = (nframes // time_dims) * time_dims
            if total == 0:
                log.warning(
                    "video %s decoded to %d frames (< time_dims=%d); "
                    "writing an empty salmap", name, nframes, time_dims,
                )
            decoded.append((name, vidimgs[:total], total, height, width))
        return decoded

    # decode group g+1 on a worker thread while group g runs inference
    # (cv2 releases the GIL during decode). NOTE: this keeps up to TWO
    # decoded groups resident — peak host RAM is ~2x the sequential path
    # (a 5000-frame 360x640 group is ~3.5 GB); lower videos_per_batch /
    # save_frames if that's too much.
    from concurrent.futures import ThreadPoolExecutor

    groups = [file_names[g0 : g0 + v_per] for g0 in range(0, len(file_names), v_per)]
    pool = ThreadPoolExecutor(max_workers=1)
    future = None
    try:
        future = pool.submit(_decode_group, groups[0]) if groups else None
        for gi, group in enumerate(groups):
            g0 = gi * v_per
            log.info("videos %d-%d/%d: %s", g0 + 1, g0 + len(group), len(file_names), group)
            t0 = time.time()

            decoded = future.result()
            future = (
                pool.submit(_decode_group, groups[gi + 1])
                if gi + 1 < len(groups)
                else None
            )

            v = len(decoded)
            if v < v_per and (len(groups) > 1 or mesh is not None
                              or injected_step):
                # ragged FINAL group: pad with zero-frame dummy entries so
                # the (V, ...) shapes match the already-compiled program —
                # an unpadded last group would recompile the whole model
                # for one batch; under a mesh an unpadded V would not
                # divide the 'data' axis (shard_map rejects it); an injected
                # AOT infer_step has its V baked into the artifact. Dummies
                # (name=None) produce no clips, no scatter writes, and no
                # output file. A lone unpadded group with NONE of those
                # constraints skips the padding: nothing is compiled yet, so
                # the smaller V compiles once and wastes no dummy compute.
                dummy = (None, decoded[0][1][:0], 0, 1, 1)
                decoded = decoded + [dummy] * (v_per - v)
                v = v_per
            max_total = max(d[2] for d in decoded)
            state = model.init_state(shape_r, shape_c, v)
            if compute_dtype is not None:
                state = state.astype(compute_dtype)
            if state_sharding is not None:
                state = jax.device_put(state, state_sharding)
            sals = [
                np.zeros((d[2], shape_r_out, shape_c_out), np.float32) for d in decoded
            ]

            def build_clip(start):
                clip = np.zeros((v, s) + decoded[0][1].shape[1:], np.uint8)
                for i, (_, imgs, total, _, _) in enumerate(decoded):
                    if total == 0:  # too short for one clip: stays zeros
                        continue
                    chunk = imgs[start : start + s]
                    if chunk.shape[0] == 0:  # exhausted video: repeat last frame
                        chunk = np.repeat(imgs[-1:], s, 0)
                    elif chunk.shape[0] < s:
                        chunk = np.concatenate(
                            [chunk, np.repeat(chunk[-1:], s - chunk.shape[0], 0)], 0
                        )
                    clip[i] = chunk
                return clip

            def scatter(out_dev, start):
                out = np.asarray(out_dev, np.float32)  # blocks on step `start`
                for i, (_, _, total, _, _) in enumerate(decoded):
                    n_valid = min(s, max(0, total - start))
                    if n_valid:
                        sals[i][start : start + n_valid] = out[i, :n_valid, :, :, 0]

            # 3-stage pipeline: ship k+1 and drain k-1 while k computes
            starts = list(range(0, max_total, s))
            # device_put(x, None) == default placement, so x_sharding routes
            # both the single-chip and the mesh-sharded path
            next_clip = (
                jax.device_put(build_clip(starts[0]), x_sharding) if starts else None
            )
            pending = None  # (device saliency, start) of the previous step
            for k, start in enumerate(starts):
                out_dev, state = infer_step(
                    params, batch_stats, next_clip, gauss, ob, state
                )  # async dispatch: returns immediately
                if k + 1 < len(starts):
                    next_clip = jax.device_put(build_clip(starts[k + 1]), x_sharding)
                if pending is not None:
                    scatter(*pending)
                pending = (out_dev, start)
            if pending is not None:
                scatter(*pending)

            for (name, _, total, height, width), sal in zip(decoded, sals):
                if name is None:  # shape-padding dummy: nothing to write
                    continue
                pred_mat = np.zeros((height, width, 1, total), np.uint8)
                for t in range(total):
                    pred_mat[:, :, 0, t] = im2uint8(
                        postprocess_prediction(sal[t], height, width)
                    )
                keep = int(min(total, save_frames))
                out_file = os.path.join(output_path, os.path.splitext(name)[0] + ".mat")
                savemat(out_file, {"salmap": pred_mat[:, :, :, :keep]})

            frames = sum(d[2] for d in decoded)
            fps = frames / max(time.time() - t0, 1e-9)
            log.info("  %d frames in %.2fs (%.1f FPS end-to-end)", frames, time.time() - t0, fps)
    finally:
        # cancel the queued decode on error; surface a worker exception that
        # would otherwise be silently dropped when the main loop dies first
        pool.shutdown(wait=False, cancel_futures=True)
        if future is not None:
            future.cancel()
            try:
                # Short wait only: long enough to catch a decode that failed
                # just before the main loop raised, without stalling error
                # propagation (or Ctrl-C) behind a multi-GB decode in flight.
                exc = future.exception(timeout=1)
            except Exception:  # still running or cancelled: nothing to report
                exc = None
            if exc is not None:
                log.error("prefetch decode failed: %s", exc)
