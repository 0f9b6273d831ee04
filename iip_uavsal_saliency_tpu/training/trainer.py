"""The training loop: whole videos as clips with carried recurrent state.

TPU-native equivalent of the reference's inline train() function
(reference: Demo_Train_Test.py:35-174):

- per epoch, train + val phases over the txt video lists;
- per video: decode + letterbox all frames, truncate to a multiple of
  time_dims, slice into clips of batch_size*time_dims frames;
- per clip: skip if any GT frame is empty (:125-126), forward with priors and
  the carried recurrent state, composite loss, Adam step (train phase only),
  carry the state across clips (TBPTT — state crosses the jit boundary as
  data, so no gradient flows into previous clips, matching the reference's
  `.detach()` at :144);
- early stopping on the epoch mean loss with patience (:155-169), per-epoch
  checkpoints, best-weights `_final` artifact (:171-174).

TPU specifics:
- the forward/backward/Adam of one clip is a single jitted XLA program;
- single-video training runs a video's ragged final clip at its TRUE size
  (the reference's exact smaller-last-batch semantics; at most batch_size
  cached step shapes). The multi-video DP path instead right-pads ragged
  clips with repeated frames and masks the loss so groups stack into one
  program (see _video_clips);
- frames ship to the device as uint8 (normalize fused on-chip);
- optional Mesh for data-parallel training over multiple videos at once
  (`videos_per_step > 1`), a capability the reference lacks.
"""

from __future__ import annotations

import dataclasses
import math
import os
import time
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.lists import read_video_list
from ..data.priors import get_gauss_priors, get_ob_priors
from ..data.video import (preprocess_videos, preprocess_vidfixs,
                          preprocess_vidmaps, probe_nframes)
from ..models import UAVSal
from ..parallel.steps import TrainState, create_train_state, make_eval_step, make_train_step
from ..utils.logging import get_logger
from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from .optim import make_frozen_mask, make_optimizer

log = get_logger("trainer")


@dataclasses.dataclass
class TrainConfig:
    """Hyperparameters (defaults == reference __main__, Demo_Train_Test.py:283-295)."""

    method_name: str = "UAVSal"
    model_name: str = "uavsal"   # any MODEL_ZOO name (ablations train too)
    cnn_type: str = "mobilenet_v2"
    iosize: Tuple[int, int, int, int] = (360, 640, 45, 80)
    time_dims: int = 5
    num_stblock: int = 2
    st_type: str = "st"  # uavsal_stblocks_type ordering (st/s2t/t2s/s_s2t)
    bias_type: Tuple[int, int, int] = (1, 1, 1)
    batch_size: int = 2          # clips per step (flattened into S, as reference)
    epochs: int = 20
    learning_rate: float = 1e-4  # fine-tune recipe: 1e-5 (README:99)
    weight_decay: float = 5e-5   # fine-tune recipe: 5e-6
    freeze: Tuple[str, ...] = ("trunk/sfnet", "trunk/st_layer")  # ref :59-62
    is_early_stop: bool = True
    max_patience: int = 4
    is_best_only: bool = False
    shuffle_train: bool = True
    max_train_frames: float = float("inf")
    max_val_frames: float = float("inf")
    videos_per_step: int = 1     # >1 enables multi-video data parallelism
    resume: bool = False         # continue from the latest epoch checkpoint
    loss_name: str = "fu"        # any training.losses.LOSSES key
    mixed_precision: bool = False  # bf16 compute, f32 masters (~2x step speed)
    remat: bool = False          # recompute fwd in bwd: big clips in less HBM
    prefetch_decode: bool = True  # decode video k+1 while k steps on device
    donate: bool = False         # in-place TrainState update: ~150 MB less
    # peak HBM, but measured SLOWER on TPU v5e (docs/PERF.md) — HBM-headroom
    # opt-in like remat, not a default


def _masked_loss(loss_fn: Callable):
    """Masked form of `loss_fn` over (pred, [true | validity-mask]): the
    per-frame terms of the passed loss are reweighted by the mask so
    right-padded frames contribute nothing — one compiled program serves full
    and ragged clips alike, and on full clips the result equals
    `loss_fn(pred, true)` exactly (see losses.PER_FRAME)."""
    from .losses import PER_FRAME

    per_frame = PER_FRAME.get(loss_fn)
    if per_frame is None:
        raise ValueError(
            f"no per-frame form registered for {loss_fn!r}; "
            f"add it to training.losses.PER_FRAME"
        )

    def fn(pred, true_and_mask):
        true, mask = true_and_mask[..., :2], true_and_mask[..., 2]
        per = per_frame(pred, true)
        w = (mask[:, 0, 0] > 0.5).astype(per.dtype)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

    return fn


class Trainer:
    """Orchestrates train/val epochs with TBPTT over clips."""

    def __init__(
        self,
        config: TrainConfig,
        train_data_dir: str,
        dataset: str,
        save_model_dir: str,
        ext: str = ".avi",
        pre_variables=None,
        priors_cache_dir: str = "",
        mesh=None,
    ):
        self.cfg = config
        self._nframes_cache: dict = {}
        self.train_data_dir = train_data_dir
        self.dataset = dataset
        self.ext = ext
        self.mesh = mesh
        if mesh is not None:
            n_data = dict(mesh.shape).get("data", 1)
            if config.videos_per_step % max(n_data, 1):
                # fail here with a clear message instead of a cryptic
                # "dimension 0 not divisible" deep inside jit dispatch
                raise ValueError(
                    f"videos_per_step={config.videos_per_step} must be a "
                    f"multiple of the mesh 'data' axis ({n_data}) so the "
                    "video batch shards evenly"
                )

        self.model_dir = os.path.join(save_model_dir, config.method_name)
        os.makedirs(self.model_dir, exist_ok=True)
        self.prefix = os.path.join(self.model_dir, config.method_name)

        from ..utils.metrics_log import MetricsLogger

        self.metrics = MetricsLogger(self.model_dir)

        shape_r, shape_c, shape_r_out, shape_c_out = config.iosize
        from ..models.adapters import build_adapted_model

        # (multi-device meshes force the partitionable XLA TWA scan inside
        # parallel.steps._partitionable_model — no per-caller gating needed)
        self.model = build_adapted_model(
            config.model_name,
            filter_kwargs=True,  # variants keep only the kwargs they declare
            cnn_type=config.cnn_type,
            time_dims=config.time_dims,
            num_stblock=config.num_stblock,
            st_type=config.st_type,
            bias_type=config.bias_type,
        )

        self.gauss = (
            jnp.asarray(get_gauss_priors(shape_r_out, shape_c_out, 8, priors_cache_dir))
            if config.bias_type[0]
            else None
        )
        self.ob = (
            jnp.asarray(
                get_ob_priors(
                    train_data_dir, dataset, "train", shape_r_out, shape_c_out, 20,
                    priors_cache_dir,
                )
            )
            if config.bias_type[1]
            else None
        )

        # init / warm-start
        s_frames = config.batch_size * config.time_dims
        dummy_x = jnp.zeros((1, s_frames, shape_r, shape_c, 3), jnp.float32)
        dummy_state = self.model.init_state(shape_r, shape_c, 1)
        from ..models import is_image_stage_variables

        image_stage = pre_variables is not None and is_image_stage_variables(
            pre_variables
        )
        if pre_variables is not None:
            from ..ops.fold import looks_folded

            if looks_folded(pre_variables):
                raise ValueError(
                    "pre_variables carry fold_batchnorm's signature (BN "
                    "scale absorbed into conv kernels). Training on folded "
                    "variables would double-count the BN scale under live "
                    "batch statistics. Load the raw checkpoint instead — "
                    "e.g. load_model_for_inference(..., fold_bn=False) or "
                    "training.checkpoint.load_checkpoint directly."
                )
        if pre_variables is None or image_stage:
            from ..models import init_variables

            variables = init_variables(
                self.model, jax.random.PRNGKey(0), dummy_x, self.gauss, self.ob, dummy_state
            )
            if image_stage:
                # SALICON SRF-Net warm start (reference 3-stage recipe,
                # README.md:60): the checkpoint is an SRFNetImage tree, not
                # video-model variables — transplant the pretrained neck
                # into the freshly initialized video model.
                from ..models import transfer_sfnet

                variables = transfer_sfnet(pre_variables, variables)
                log.info(
                    "image-stage checkpoint detected: transplanted the "
                    "SALICON-pretrained SRF-Net into the video model "
                    "(models.transfer_sfnet)"
                )
        else:
            variables = pre_variables

        mask = make_frozen_mask(variables["params"], config.freeze) if config.freeze else None
        self.tx = make_optimizer(
            config.learning_rate, config.weight_decay, trainable_mask=mask
        )
        self.state = create_train_state(variables, self.tx)

        from .losses import LOSSES

        loss = LOSSES[config.loss_name]
        # tensor parallelism: when the mesh has a >1 'model' axis, shard the
        # 1x1-conv kernels + Adam moments on output channels and keep the
        # step's outputs in that layout (parallel/mesh.param_sharding_rules)
        shardings = None
        if mesh is not None and dict(mesh.shape).get("model", 1) > 1:
            from ..parallel.steps import train_state_shardings

            shardings = train_state_shardings(mesh, self.state)
            self.state = jax.device_put(self.state, shardings)
        # donate: in-place TrainState update — XLA reuses the params +
        # Adam-moment buffers (~150 MB f32 at the flagship size) instead of
        # re-allocating each step. Correct either way (the best-epoch
        # snapshot is device_get to HOST arrays — see _snapshot — so nothing
        # aliases donated buffers across steps), but measured on TPU v5e at
        # the V=1 S=30 360x640 flagship shape it is ~9% SLOWER in f32
        # (448 vs 412 ms/step) and ~1% slower in bf16 — the aliasing
        # constraint forces copies in the Adam update that cost more than
        # the allocator saves (tools/bench_train.py, interleaved A/B;
        # docs/PERF.md "Training throughput"). Default off; opt in via
        # TrainConfig.donate when a big clip shape needs the HBM headroom
        # (it composes with --remat).
        self.train_step = make_train_step(
            self.model, self.tx, loss_fn=_masked_loss(loss), mesh=mesh,
            donate=config.donate,
            state_shardings=shardings,
            compute_dtype=jnp.bfloat16 if config.mixed_precision else None,
            remat=config.remat,
        )
        self.eval_step = make_eval_step(
            self.model, loss_fn=_masked_loss(loss), mesh=mesh,
            param_shardings=shardings.params if shardings is not None else None,
        )

    # ------------------------------------------------------------------ #

    def _video_clips(self, vid_path, map_path, fix_path, max_frames,
                     pad_ragged: bool = False):
        """Host-side per-video pipeline -> list of clips.

        The final clip of a video is usually smaller than
        batch_size*time_dims. With `pad_ragged=False` (single-video path,
        the default) it is emitted at its TRUE size — exactly the
        reference's smaller-last-batch behavior (Demo_Train_Test.py:121-128):
        BN batch statistics, the temporal-difference edge rule, and the
        context tile all see only real frames, at the cost of at most
        batch_size-1 extra (cached) compiled step shapes. With
        `pad_ragged=True` (the multi-video DP path, which must np.stack
        same-shaped clips across videos) it is right-padded by repeating the
        last frame with the loss masked — padded frames then contribute
        (statistically similar) samples to train-mode BN stats and zero the
        boundary frame's backward temporal difference; length-bucketing
        keeps such clips rare."""
        cfg = self.cfg
        shape_r, shape_c, shape_r_out, shape_c_out = cfg.iosize
        vidmaps = preprocess_vidmaps(map_path, shape_r_out, shape_c_out, max_frames)
        vidfixs = preprocess_vidfixs(fix_path, shape_r_out, shape_c_out, max_frames)
        vidimgs, nframes, _, _ = preprocess_videos(
            vid_path, shape_r, shape_c, max_frames, mode="RGB", normalize=False
        )
        nframes = min(vidfixs.shape[0], vidmaps.shape[0], nframes)
        count_bs = nframes // cfg.time_dims
        frames = count_bs * cfg.time_dims
        vidimgs = vidimgs[:frames]
        gaze = np.concatenate([vidmaps[:frames], vidfixs[:frames]], axis=-1)

        s = cfg.batch_size * cfg.time_dims
        clips = []
        for start in range(0, frames, s):
            x = vidimgs[start : start + s]
            y = gaze[start : start + s].astype(np.float32)
            # skip-if-empty-GT (reference: Demo_Train_Test.py:125-126)
            if not np.all(np.any(y, axis=(1, 2))):
                continue
            n_valid = x.shape[0]
            if pad_ragged and n_valid < s:
                pad = s - n_valid
                x = np.concatenate([x, np.repeat(x[-1:], pad, 0)], 0)
                y = np.concatenate([y, np.repeat(y[-1:], pad, 0)], 0)
            mask = np.zeros((x.shape[0], shape_r_out, shape_c_out, 1), np.float32)
            mask[:n_valid] = 1.0
            clips.append((x, np.concatenate([y, mask], -1)))
        return clips

    def _step(self, phase: str, x, y, rnn_state):
        if phase == "train":
            self.state, loss, rnn_state = self.train_step(
                self.state, x, self.gauss, self.ob, rnn_state, y
            )
        else:
            loss, rnn_state = self.eval_step(
                self.state.params, self.state.batch_stats,
                x, self.gauss, self.ob, rnn_state, y,
            )
        return float(loss), rnn_state

    def _decode_iter(self, items, load):
        """Iterate `load(item)` with one-ahead background decode (the same
        overlap the serving runner uses): video k+1 letterboxes on a worker
        thread while video k's clips step on the device. OpenCV and numpy
        release the GIL, so decode and device dispatch genuinely overlap on
        multi-core hosts. `prefetch_decode=False` restores serial decode."""
        if not self.cfg.prefetch_decode or len(items) < 2:
            return (load(it) for it in items)
        from ..data.loaders import _prefetched

        return _prefetched(items, load, prefetch=1)

    def _run_epoch(self, phase: str) -> float:
        cfg = self.cfg
        shape_r, shape_c = cfg.iosize[:2]
        shuffle = cfg.shuffle_train if phase == "train" else False
        max_frames = cfg.max_train_frames if phase == "train" else cfg.max_val_frames
        videos, vidmaps, vidfixs = read_video_list(
            self.train_data_dir, phase, shuffle=shuffle, ext=self.ext
        )
        if cfg.videos_per_step > 1:
            return self._run_epoch_multivideo(
                phase, videos, vidmaps, vidfixs, max_frames
            )
        run_loss, num_step = 0.0, 0
        triples = list(zip(videos, vidmaps, vidfixs))
        clip_iter = self._decode_iter(
            triples, lambda t: self._video_clips(*t, max_frames)
        )
        for idx, clips in enumerate(clip_iter):
            vp = triples[idx][0]
            log.info("%s video %d/%d: %s", phase, idx + 1, len(videos), os.path.basename(vp))
            rnn_state = self.model.init_state(shape_r, shape_c, 1)
            video_loss, n_clips = 0.0, 0
            for x, y in clips:
                # uint8 to the device (4x less transfer); the step
                # normalizes on-chip (parallel/steps._maybe_normalize)
                x = jnp.asarray(x)[None]  # (1, S, H, W, 3) uint8
                y = jnp.asarray(y)[None]
                loss, rnn_state = self._step(phase, x, y, rnn_state)
                video_loss += loss
                run_loss += loss
                num_step += 1
                n_clips += 1
                if phase == "train":
                    self.metrics.scalar("train/loss", loss, int(self.state.step))
            if n_clips:
                log.info("  mean %s loss: %.4f", phase, video_loss / n_clips)
        if not num_step:
            # 0.0 would win the early-stop comparison and freeze best
            # weights at this (untrained) epoch; inf marks "no signal"
            # (image_trainer does the same)
            log.warning("%s epoch ran ZERO steps (empty split or all "
                        "clips skipped for empty GT)", phase)
            return float("inf")
        return run_loss / num_step

    def _run_epoch_multivideo(self, phase, videos, vidmaps, vidfixs, max_frames) -> float:
        """Data-parallel epoch: groups of `videos_per_step` videos advance in
        lock-step, one (V, S, ...) batch per step — V shards over the mesh's
        'data' axis when a Mesh is given (a capability the single-GPU
        reference lacks). Videos shorter than the group's longest are
        right-padded with repeated clips whose loss mask is zero, so one
        compiled program serves every group.

        Groups are LENGTH-BUCKETED: videos are stably sorted by header frame
        count (probe_nframes — no decode) before grouping, so like-length
        videos share a group and padded fully-masked clips are rare. A
        shuffled epoch stays shuffled *within* equal lengths (stable sort),
        and each video still contributes exactly its own clips, so per-video
        losses are order-independent."""
        cfg = self.cfg
        v_per = cfg.videos_per_step
        shape_r, shape_c = cfg.iosize[:2]
        triples = list(zip(videos, vidmaps, vidfixs))
        try:
            # Header probes are static per path — cache across epochs/phases
            # so a several-hundred-video run pays one container open per
            # video total, not per epoch.
            cache = self._nframes_cache
            for vp, _, _ in triples:
                if vp not in cache:
                    cache[vp] = probe_nframes(vp)
            triples.sort(key=lambda t: min(cache[t[0]], max_frames))
        except Exception:  # unreadable header: keep list order
            log.warning("length-bucketing skipped: frame-count probe failed")
        run_loss, num_step = 0.0, 0
        groups = [triples[g0 : g0 + v_per] for g0 in range(0, len(videos), v_per)]
        group_iter = self._decode_iter(
            groups,
            lambda grp: [
                self._video_clips(vp, mp, fp, max_frames, pad_ragged=True)
                for vp, mp, fp in grp
            ],
        )
        for gi, clip_lists in enumerate(group_iter):
            group = groups[gi]
            g0 = gi * v_per
            log.info("%s videos %d-%d/%d", phase, g0 + 1, g0 + len(group), len(videos))
            # pad the group itself (last group may be short): duplicate the
            # first video with a fully-masked clip list
            while len(clip_lists) < v_per:
                clip_lists.append(
                    [(x, np.concatenate([y[..., :2], np.zeros_like(y[..., 2:])], -1))
                     for x, y in clip_lists[0]]
                )
            if not any(clip_lists):
                continue
            donor = next(c for c in clip_lists if c)
            n_steps = max(len(c) for c in clip_lists)
            rnn_state = self.model.init_state(shape_r, shape_c, v_per)
            for t in range(n_steps):
                xs, ys = [], []
                for clips in clip_lists:
                    if t < len(clips):
                        x, y = clips[t]
                    else:  # exhausted/empty video: repeat a clip, mask zeroed
                        x, y = (clips or donor)[-1]
                        y = np.concatenate([y[..., :2], np.zeros_like(y[..., 2:])], -1)
                    xs.append(x)  # uint8: normalized on-chip by the step
                    ys.append(y)
                x = jnp.asarray(np.stack(xs))
                y = jnp.asarray(np.stack(ys))
                loss, rnn_state = self._step(phase, x, y, rnn_state)
                run_loss += loss
                num_step += 1
                if phase == "train":
                    self.metrics.scalar("train/loss", loss, int(self.state.step))
        if not num_step:
            log.warning("%s epoch ran ZERO steps (empty split or all "
                        "clips skipped for empty GT)", phase)
            return float("inf")
        return run_loss / num_step

    def train(self) -> TrainState:
        try:
            return self._train()
        finally:
            self.metrics.close()  # flush the TB mirror / JSONL handle

    def _train(self) -> TrainState:
        cfg = self.cfg
        min_val_loss = float("inf")
        num_patience = 0
        max_patience = cfg.max_patience if cfg.is_early_stop else cfg.epochs + 1

        start_epoch = 0
        best_ckpt = f"{self.prefix}_best.ckpt"
        if cfg.resume:
            latest = latest_checkpoint(self.model_dir, cfg.method_name)
            if latest:
                import flax.serialization

                ckpt = load_checkpoint(latest)
                self.state = TrainState(
                    params=flax.serialization.from_state_dict(
                        self.state.params, ckpt["params"]),
                    batch_stats=flax.serialization.from_state_dict(
                        self.state.batch_stats, ckpt["batch_stats"]),
                    opt_state=flax.serialization.from_state_dict(
                        self.state.opt_state, ckpt["opt_state"]),
                    step=jnp.asarray(ckpt["step"], jnp.int32),
                )
                start_epoch = int(ckpt["epoch"]) + 1
                # early-stop bookkeeping: without it a resumed run forgets
                # the pre-crash best (worse _final weights) and re-arms the
                # patience counter (late early stop)
                min_val_loss = float(ckpt.get("min_val_loss", float("inf")))
                num_patience = int(ckpt.get("num_patience", 0))
                log.info(
                    "resumed from %s (epoch %d, best val %.4f, patience %d)",
                    latest, start_epoch, min_val_loss, num_patience,
                )

        # Host snapshots, NOT aliases: under TrainConfig.donate the train
        # step donates the TrainState, so holding live device buffers here
        # would leave best_params pointing at deleted memory after the next
        # step. device_get is also what checkpoint serialization needs, so
        # the non-donated path loses nothing.
        def _snapshot(tree):
            return jax.device_get(tree)

        best_params = _snapshot(self.state.params)
        best_stats = _snapshot(self.state.batch_stats)
        if cfg.resume and start_epoch and os.path.exists(best_ckpt):
            import flax.serialization

            best = load_checkpoint(best_ckpt)
            best_params = flax.serialization.from_state_dict(
                self.state.params, best["params"])
            best_stats = flax.serialization.from_state_dict(
                self.state.batch_stats, best["batch_stats"])

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            for phase in ("train", "val"):
                mean_loss = self._run_epoch(phase)
                log.info("epoch %d/%d mean %s loss: %.4f", epoch + 1, cfg.epochs, phase, mean_loss)
                self.metrics.scalar(f"{phase}/mean_loss", mean_loss, epoch)
            # as in the reference, the early-stop metric is the LAST phase's
            # mean loss (val), Demo_Train_Test.py:155-169
            is_new_best = mean_loss < min_val_loss
            if is_new_best:
                best_params = _snapshot(self.state.params)
                best_stats = _snapshot(self.state.batch_stats)
                if not cfg.is_best_only:
                    # Persist the new best BEFORE the epoch checkpoint records
                    # this epoch's loss as min_val_loss: a crash between the
                    # two writes must never leave a resume whose min_val_loss
                    # points at weights that were never saved.
                    save_checkpoint(
                        best_ckpt,
                        {"params": best_params, "batch_stats": best_stats},
                    )
            if not cfg.is_best_only:
                save_checkpoint(
                    f"{self.prefix}_{epoch:02d}_{mean_loss:.4f}.ckpt",
                    {
                        "params": self.state.params,
                        "batch_stats": self.state.batch_stats,
                        "opt_state": self.state.opt_state,
                        "step": self.state.step,
                        "epoch": epoch,
                        "min_val_loss": min(mean_loss, min_val_loss),
                        "num_patience": 0 if is_new_best else num_patience + 1,
                    },
                )
            if is_new_best:
                min_val_loss = mean_loss
                num_patience = 0
            else:
                num_patience += 1
                if num_patience >= max_patience:
                    log.info("early stop at epoch %d", epoch + 1)
                    break
            log.info("epoch time: %.1fs", time.time() - t0)

        save_checkpoint(
            f"{self.prefix}_final.ckpt",
            {"params": best_params, "batch_stats": best_stats},
        )
        self.state = TrainState(
            params=best_params,
            batch_stats=best_stats,
            opt_state=self.state.opt_state,
            step=self.state.step,
        )
        return self.state
