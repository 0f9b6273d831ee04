"""End-to-end pipeline on a synthetic on-disk video dataset:
train (1 epoch TBPTT) -> per-video .mat inference -> 7-metric eval ->
mean scores -> overlay video. Exercises Trainer, runners.infer,
evaluation.scorer, vis.overlay together, dataset-free."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from iip_uavsal_saliency_tpu.data.matio import loadmat, savemat
from iip_uavsal_saliency_tpu.data.priors import get_gauss_priors
from iip_uavsal_saliency_tpu.evaluation.scorer import (
    evalscores_vid,
    evalscores_vid_sum,
    mean_scores,
)
from iip_uavsal_saliency_tpu.runners.infer import test_videos as run_test_videos
from iip_uavsal_saliency_tpu.training.checkpoint import load_checkpoint
from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer
from iip_uavsal_saliency_tpu.vis.overlay import visual_vid

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

# tiny everything: 64x64 input -> 8x8 output, 2-frame clips, 8-frame videos
IOSIZE = (64, 64, 8, 8)
TIME_DIMS = 2
NATIVE_H, NATIVE_W, NFRAMES = 48, 72, 8


def _write_video(path, rng):
    fourcc = cv2.VideoWriter_fourcc(*"DIVX")
    wr = cv2.VideoWriter(path, fourcc, 10, (NATIVE_W, NATIVE_H), isColor=True)
    for _ in range(NFRAMES):
        wr.write(rng.randint(0, 255, (NATIVE_H, NATIVE_W, 3), np.uint8))
    wr.release()


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    """Reference layout: Videos/, maps/<v>_fixMaps.mat, fixations/maps/
    <v>_fixPts.mat, txt/{train,val}.txt."""
    root = tmp_path_factory.mktemp("UAV2")
    rng = np.random.RandomState(0)
    for d in ("Videos", "maps", os.path.join("fixations", "maps"), "txt"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    names = ["vid_a", "vid_b"]
    for name in names:
        _write_video(os.path.join(root, "Videos", name + ".avi"), rng)
        fmap = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        floc = np.zeros((NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
        for t in range(NFRAMES):
            yy, xx = rng.randint(8, NATIVE_H - 8), rng.randint(8, NATIVE_W - 8)
            floc[yy, xx, 0, t] = 1
            blur = np.zeros((NATIVE_H, NATIVE_W), np.float32)
            blur[yy, xx] = 255
            fmap[:, :, 0, t] = cv2.GaussianBlur(blur, (21, 21), 6).astype(np.uint8)
        savemat(os.path.join(root, "maps", name + "_fixMaps.mat"), {"fixMap": fmap})
        savemat(
            os.path.join(root, "fixations", "maps", name + "_fixPts.mat"),
            {"fixLoc": floc},
        )
    with open(os.path.join(root, "txt", "train.txt"), "w") as f:
        f.write("vid_a\n")
    with open(os.path.join(root, "txt", "val.txt"), "w") as f:
        f.write("vid_b\n")
    return str(root)


@pytest.fixture(scope="module")
def trained(video_dataset, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("weights"))
    cfg = TrainConfig(
        method_name="TinyUAVSal",
        iosize=IOSIZE,
        time_dims=TIME_DIMS,
        batch_size=1,
        epochs=1,
        bias_type=(1, 0, 1),  # no observed priors (needs dataset cache)
        freeze=(),
        is_early_stop=False,
    )
    trainer = Trainer(
        cfg, video_dataset, "UAV2", save_dir, ext=".avi",
        priors_cache_dir=str(tmp_path_factory.mktemp("priors")),
    )
    state = trainer.train()
    final = os.path.join(save_dir, "TinyUAVSal", "TinyUAVSal_final.ckpt")
    assert os.path.exists(final)
    return trainer, state, final


def test_train_one_epoch(trained):
    trainer, state, final = trained
    assert int(state.step) > 0
    ckpt = load_checkpoint(final)
    assert "params" in ckpt and "batch_stats" in ckpt


def test_infer_eval_vis(trained, video_dataset, tmp_path_factory):
    trainer, state, final = trained
    res_dir = str(tmp_path_factory.mktemp("Results"))
    out_path = os.path.join(res_dir, "Saliency")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    run_test_videos(
        video_dataset + "/Videos",
        out_path,
        trainer.model,
        variables,
        iosize=IOSIZE,
        batch_size=1,
        time_dims=TIME_DIMS,
        bias_type=(1, 0, 1),
        method_name="TinyUAVSal",
    )
    out_a = os.path.join(out_path, "TinyUAVSal", "vid_a.mat")
    assert os.path.exists(out_a)
    sal = loadmat(out_a, "salmap")
    assert sal.shape == (NATIVE_H, NATIVE_W, 1, NFRAMES)
    assert sal.dtype == np.uint8
    assert sal.max() == 255  # per-frame max-normalized

    # resumability: second call must skip (mtime unchanged)
    mtime = os.path.getmtime(out_a)
    run_test_videos(
        video_dataset + "/Videos", out_path, trainer.model, variables,
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
        method_name="TinyUAVSal",
    )
    assert os.path.getmtime(out_a) == mtime

    # 7-metric eval + mean scores
    evalscores_vid(
        video_dataset, res_dir, "UAV2", ["TinyUAVSal"],
        batch_size=4, rng=np.random.RandomState(0),
    )
    iscore = loadmat(
        os.path.join(res_dir, "Scores", "TinyUAVSal", "Score_vid_a.mat"), "iscore"
    )
    assert iscore.shape == (NFRAMES, 7)
    means = mean_scores(res_dir, ["TinyUAVSal"])
    assert 0.0 <= means["TinyUAVSal"]["AUC_Judd"] <= 1.0
    mm = loadmat(os.path.join(res_dir, "Scores", "MeanScores.mat"), "meanscores")
    assert mm.shape == (1, 7)
    assert os.path.exists(os.path.join(res_dir, "Scores", "MeanScores.json"))

    # sum-shufmap variant
    evalscores_vid_sum(
        video_dataset, res_dir, "UAV2", ["TinyUAVSal"],
        batch_size=4, rng=np.random.RandomState(0),
    )
    assert os.path.exists(
        os.path.join(res_dir, "Scores_sum", "TinyUAVSal", "Score_vid_a.mat")
    )

    # overlay video (written under Saliency/<m>/Visual_color_map, as the
    # reference does: utils_vis.py:139-145)
    visual_vid(video_dataset, res_dir, "UAV2", ["TinyUAVSal"], with_color=1)
    vis_dir = os.path.join(out_path, "TinyUAVSal", "Visual_color_map")
    assert os.path.exists(vis_dir) and os.listdir(vis_dir), "no overlay videos"


def test_video_dataset_iterators(video_dataset):
    from iip_uavsal_saliency_tpu.data.loaders import test_dataset as make_test_ds
    from iip_uavsal_saliency_tpu.data.loaders import video_dataset as make_video_ds

    names, it = make_video_ds(video_dataset, "train", iosize=IOSIZE, ext=".avi")
    name, imgs, gaze = next(iter(it))
    assert imgs.shape == (NFRAMES, IOSIZE[0], IOSIZE[1], 3) and imgs.dtype == np.uint8
    assert gaze.shape == (NFRAMES, IOSIZE[2], IOSIZE[3], 2)

    vids, it = make_test_ds(video_dataset + "/Videos", iosize=IOSIZE)
    assert len(vids) == 2
    name, imgs, nframes, h, w = next(iter(it))
    assert (nframes, h, w) == (NFRAMES, NATIVE_H, NATIVE_W)


def test_traindata_dataset(tmp_path):
    from iip_uavsal_saliency_tpu.data.loaders import traindata_dataset

    root = tmp_path / "packed"
    for d in ("vidmat", "labels", "txt"):
        os.makedirs(root / d)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (6, 16, 16, 3), np.uint8)
    gaze = rng.randint(0, 255, (6, 8, 8, 2), np.uint8)
    savemat(str(root / "vidmat" / "v0.mat"),
            {"videos": imgs, "oh": np.array([32]), "ow": np.array([48])})
    savemat(str(root / "labels" / "v0.mat"), {"gazemap": gaze})
    (root / "txt" / "train.txt").write_text("v0\n")

    names, it = traindata_dataset(str(root), "train", max_frames=4)
    name, vi, vg = next(iter(it))
    assert vi.shape == (4, 16, 16, 3)
    assert vg.shape == (4, 8, 8, 2)


def test_train_multivideo_dp(video_dataset, tmp_path_factory):
    """videos_per_step=2: both train videos advance in lock-step as one
    (V=2, S, ...) batch, sharded over a 2-device 'data' mesh."""
    from iip_uavsal_saliency_tpu.parallel.mesh import make_mesh

    save_dir = str(tmp_path_factory.mktemp("weights_dp"))
    # put both videos in train.txt for a full group
    with open(os.path.join(video_dataset, "txt", "train.txt"), "w") as f:
        f.write("vid_a\nvid_b\n")
    try:
        cfg = TrainConfig(
            method_name="TinyDP",
            iosize=IOSIZE,
            time_dims=TIME_DIMS,
            batch_size=1,
            epochs=1,
            bias_type=(1, 0, 1),
            freeze=(),
            is_early_stop=False,
            videos_per_step=2,
        )
        trainer = Trainer(
            cfg, video_dataset, "UAV2", save_dir, ext=".avi",
            priors_cache_dir=str(tmp_path_factory.mktemp("priors_dp")),
            mesh=make_mesh(n_data=2, n_spatial=1),
        )
        state = trainer.train()
        assert int(state.step) > 0
        assert np.all(np.isfinite(np.asarray(
            jax.tree_util.tree_leaves(state.params)[0])))
    finally:
        with open(os.path.join(video_dataset, "txt", "train.txt"), "w") as f:
            f.write("vid_a\n")


def test_multivideo_length_bucketing(video_dataset, tmp_path_factory, monkeypatch):
    """Multi-video groups are length-bucketed: with a 16-frame video listed
    FIRST, list-order grouping would pair it with an 8-frame video (half the
    group fully-masked padding); the stable sort by header frame count pairs
    the two 8-frame videos instead and leaves the long one to the padded
    last group. Per-video clip streams are unchanged by ordering (each video
    contributes exactly its own clips), so losses are order-independent."""
    rng = np.random.RandomState(9)
    name = "vid_long"
    _write_long = os.path.join(video_dataset, "Videos", name + ".avi")
    fourcc = cv2.VideoWriter_fourcc(*"DIVX")
    wr = cv2.VideoWriter(_write_long, fourcc, 10, (NATIVE_W, NATIVE_H), isColor=True)
    for _ in range(2 * NFRAMES):
        wr.write(rng.randint(0, 255, (NATIVE_H, NATIVE_W, 3), np.uint8))
    wr.release()
    fmap = np.zeros((NATIVE_H, NATIVE_W, 1, 2 * NFRAMES), np.uint8)
    floc = np.zeros((NATIVE_H, NATIVE_W, 1, 2 * NFRAMES), np.uint8)
    fmap[10, 10] = 255
    floc[10, 10] = 1
    savemat(os.path.join(video_dataset, "maps", name + "_fixMaps.mat"), {"fixMap": fmap})
    savemat(
        os.path.join(video_dataset, "fixations", "maps", name + "_fixPts.mat"),
        {"fixLoc": floc},
    )
    with open(os.path.join(video_dataset, "txt", "train.txt"), "w") as f:
        f.write("vid_long\nvid_a\nvid_b\n")  # long FIRST: list order would waste a group
    try:
        cfg = TrainConfig(
            method_name="TinyBucket",
            iosize=IOSIZE,
            time_dims=TIME_DIMS,
            batch_size=1,
            epochs=1,
            bias_type=(1, 0, 1),
            freeze=(),
            is_early_stop=False,
            videos_per_step=2,
            shuffle_train=False,
        )
        trainer = Trainer(
            cfg, video_dataset, "UAV2", str(tmp_path_factory.mktemp("w_bucket")),
            ext=".avi", priors_cache_dir=str(tmp_path_factory.mktemp("p_bucket")),
        )
        seen = []
        orig = trainer._video_clips

        def spy(vp, mp, fp, max_frames, **kw):
            seen.append(os.path.basename(vp))
            return orig(vp, mp, fp, max_frames, **kw)

        monkeypatch.setattr(trainer, "_video_clips", spy)
        monkeypatch.setattr(trainer, "_step", lambda phase, x, y, st: (0.0, st))
        trainer._run_epoch("train")
        assert seen == ["vid_a.avi", "vid_b.avi", "vid_long.avi"], seen
    finally:
        # restore the shared module fixture exactly: later tests enumerate
        # the Videos/ dir itself (run_test_videos), not just the txt lists
        with open(os.path.join(video_dataset, "txt", "train.txt"), "w") as f:
            f.write("vid_a\n")
        os.remove(_write_long)
        os.remove(os.path.join(video_dataset, "maps", name + "_fixMaps.mat"))
        os.remove(
            os.path.join(video_dataset, "fixations", "maps", name + "_fixPts.mat")
        )


def test_train_resume(trained, video_dataset, tmp_path_factory):
    """resume=True restores the latest epoch checkpoint and skips completed
    epochs (SURVEY §5: mid-training resume the reference lacks)."""
    trainer, state, final = trained
    cfg = TrainConfig(
        method_name="TinyUAVSal",
        iosize=IOSIZE,
        time_dims=TIME_DIMS,
        batch_size=1,
        epochs=1,  # epoch 0 already completed by the `trained` fixture
        bias_type=(1, 0, 1),
        freeze=(),
        is_early_stop=False,
        resume=True,
    )
    save_dir = os.path.dirname(os.path.dirname(final))
    t2 = Trainer(cfg, video_dataset, "UAV2", save_dir, ext=".avi")
    s2 = t2.train()
    # nothing left to run: restored step counter, no new steps taken
    assert int(s2.step) == int(state.step)


@pytest.mark.parametrize("model_name", ["uavsal_stblocks", "uavsal_lstm"])
def test_train_zoo_variant(model_name, video_dataset, tmp_path_factory):
    """Ablation-zoo variants train through the same Trainer via the
    ZooModelAdapter (stateless carry dummy; LSTM carries (V,2,...) state)."""
    save_dir = str(tmp_path_factory.mktemp(f"weights_{model_name}"))
    cfg = TrainConfig(
        method_name=f"Tiny_{model_name}",
        model_name=model_name,
        iosize=IOSIZE,
        time_dims=TIME_DIMS,
        batch_size=1,
        epochs=1,
        bias_type=(1, 0, 1),
        freeze=(),
        is_early_stop=False,
    )
    trainer = Trainer(
        cfg, video_dataset, "UAV2", save_dir, ext=".avi",
        priors_cache_dir=str(tmp_path_factory.mktemp(f"priors_{model_name}")),
    )
    state = trainer.train()
    assert int(state.step) > 0
    leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.all(np.isfinite(leaf))


def test_infer_batched_matches_single(trained, video_dataset, tmp_path_factory):
    """videos_per_batch=2 must produce byte-identical .mat outputs to the
    per-video path (padding frames never leak into kept outputs)."""
    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    res1 = str(tmp_path_factory.mktemp("R1"))
    res2 = str(tmp_path_factory.mktemp("R2"))
    common = dict(
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
        method_name="M",
    )
    run_test_videos(video_dataset + "/Videos", res1, trainer.model, variables, **common)
    run_test_videos(
        video_dataset + "/Videos", res2, trainer.model, variables,
        videos_per_batch=2, **common,
    )
    for vid in ("vid_a", "vid_b"):
        a = loadmat(os.path.join(res1, "M", vid + ".mat"), "salmap")
        b = loadmat(os.path.join(res2, "M", vid + ".mat"), "salmap")
        # batching V changes conv reduction order -> rare +/-1 uint8 jitter
        diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
        assert diff.max() <= 1 and (diff > 0).mean() < 1e-3, vid


def test_visual_vid_frames(trained, video_dataset, tmp_path_factory):
    """Per-frame PNG exporter (reference: Tools/visualization_vid_frame.py)."""
    from iip_uavsal_saliency_tpu.vis.overlay import visual_vid_frames

    trainer, state, _ = trained
    res = str(tmp_path_factory.mktemp("Rf"))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    run_test_videos(
        video_dataset + "/Videos", os.path.join(res, "Saliency"), trainer.model,
        variables, iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
        bias_type=(1, 0, 1), method_name="M",
    )
    visual_vid_frames(video_dataset, res, "UAV2", ["M"], frame_indices=(0, 3))
    out = os.path.join(res, "Saliency", "M", "Visual_frames")
    assert sorted(os.listdir(out)) == [
        "vid_a_f00000.png", "vid_a_f00000_frame.png",
        "vid_a_f00003.png", "vid_a_f00003_frame.png",
        "vid_b_f00000.png", "vid_b_f00000_frame.png",
        "vid_b_f00003.png", "vid_b_f00003_frame.png",
    ]


def test_training_overfits_synthetic(video_dataset, tmp_path_factory):
    """The training loop LEARNS: repeated epochs on one synthetic video drive
    the composite loss well below its starting value (the reference's whole
    purpose — Demo_Train_Test.py:155-174 trains to early-stop). Guards
    against sign/masking bugs that still 'run fine'."""
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        method_name="OverfitUAVSal",
        iosize=IOSIZE,
        time_dims=TIME_DIMS,
        batch_size=1,
        epochs=1,
        bias_type=(1, 0, 1),
        freeze=(),
        is_early_stop=False,
        learning_rate=1e-3,  # overfit fast; parity is tested elsewhere
        shuffle_train=False,
    )
    trainer = Trainer(
        cfg, video_dataset, "UAV2", str(tmp_path_factory.mktemp("w_overfit")),
        ext=".avi", priors_cache_dir=str(tmp_path_factory.mktemp("p_overfit")),
    )
    means = [trainer._run_epoch("train") for _ in range(8)]
    assert np.isfinite(means).all()
    assert means[-1] < means[0] - 0.5, f"no learning: {means}"
    assert min(means[-2:]) < min(means[:2]), f"loss not descending: {means}"


def test_donated_training_matches_undonated(video_dataset, tmp_path_factory):
    """TrainConfig.donate (in-place TrainState update, the HBM-headroom
    opt-in — docs/PERF.md "Training throughput") must change NOTHING
    numerically: two fresh trainers run the same 2 epochs donated and
    undonated and land on identical final params, and the donated run's
    best-epoch host snapshot survives buffer donation (_snapshot)."""
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer

    finals = []
    for donate in (False, True):
        cfg = TrainConfig(
            method_name=f"DonUAVSal{int(donate)}",
            iosize=IOSIZE,
            time_dims=TIME_DIMS,
            batch_size=1,
            epochs=2,
            bias_type=(1, 0, 1),
            freeze=(),
            is_early_stop=False,
            shuffle_train=False,
            donate=donate,
        )
        trainer = Trainer(
            cfg, video_dataset, "UAV2",
            str(tmp_path_factory.mktemp(f"w_don{int(donate)}")),
            ext=".avi",
            priors_cache_dir=str(tmp_path_factory.mktemp(f"p_don{int(donate)}")),
        )
        state = trainer.train()
        finals.append(jax.device_get(state.params))
    a = jax.tree_util.tree_leaves(finals[0])
    b = jax.tree_util.tree_leaves(finals[1])
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_training_descends_loss_kl(video_dataset, tmp_path_factory):
    """The loss_kl training path (PER_FRAME registry) also descends."""
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig, Trainer

    cfg = TrainConfig(
        method_name="KLUAVSal",
        iosize=IOSIZE,
        time_dims=TIME_DIMS,
        batch_size=1,
        epochs=1,
        bias_type=(1, 0, 1),
        freeze=(),
        is_early_stop=False,
        learning_rate=1e-3,
        shuffle_train=False,
        loss_name="kl",
    )
    trainer = Trainer(
        cfg, video_dataset, "UAV2", str(tmp_path_factory.mktemp("w_kl")),
        ext=".avi", priors_cache_dir=str(tmp_path_factory.mktemp("p_kl")),
    )
    means = [trainer._run_epoch("train") for _ in range(5)]
    assert np.isfinite(means).all()
    assert means[-1] < means[0], f"loss_kl not descending: {means}"


def test_ragged_final_clip_exact_vs_padded(video_dataset, tmp_path_factory):
    """Single-video training runs the ragged final clip at its TRUE size
    (the reference's smaller-last-batch semantics — no padded frames in BN
    statistics or temporal differences); the multi-video path pads+masks."""
    cfg = TrainConfig(
        method_name="Ragged", iosize=IOSIZE, time_dims=TIME_DIMS,
        batch_size=3,  # s=6; the 8-frame fixture video -> clips of [6, 2]
        epochs=1, bias_type=(1, 0, 1), freeze=(), is_early_stop=False,
    )
    trainer = Trainer(
        cfg, video_dataset, "UAV2", str(tmp_path_factory.mktemp("w_rag")),
        ext=".avi", priors_cache_dir=str(tmp_path_factory.mktemp("p_rag")),
    )
    # dedicated video with DENSE GT so no clip is skipped by the
    # empty-GT rule (the shared fixture's sparse GT can vanish at 8x8)
    root = tmp_path_factory.mktemp("ragged_ds")
    vp = os.path.join(str(root), "v.avi")
    mp = os.path.join(str(root), "v_fixMaps.mat")
    fp = os.path.join(str(root), "v_fixPts.mat")
    _write_video(vp, np.random.RandomState(3))
    dense = np.full((NATIVE_H, NATIVE_W, 1, NFRAMES), 128, np.uint8)
    savemat(mp, {"fixMap": dense})
    savemat(fp, {"fixLoc": (dense > 0).astype(np.uint8)})

    clips = trainer._video_clips(vp, mp, fp, float("inf"))
    assert [c[0].shape[0] for c in clips] == [6, 2]
    for x, y in clips:  # exact path: every frame real, mask all ones
        assert y.shape[0] == x.shape[0]
        np.testing.assert_array_equal(y[..., 2], 1.0)

    padded = trainer._video_clips(vp, mp, fp, float("inf"), pad_ragged=True)
    assert [c[0].shape[0] for c in padded] == [6, 6]
    np.testing.assert_array_equal(padded[1][1][:2, :, :, 2], 1.0)
    np.testing.assert_array_equal(padded[1][1][2:, :, :, 2], 0.0)
    np.testing.assert_array_equal(padded[1][0][2:], np.repeat(padded[1][0][1:2], 4, 0))


@pytest.mark.parametrize("v_per", [1, 2])
def test_prefetch_decode_equivalence(video_dataset, tmp_path_factory, v_per):
    """Background one-ahead decode must not change training: same epoch mean
    loss as serial decode, for both the single-video and the multi-video DP
    epoch paths (decode is independent of stepping; order is preserved)."""
    losses = {}
    for pref in (True, False):
        cfg = TrainConfig(
            method_name=f"Pf{v_per}{pref}", iosize=IOSIZE, time_dims=TIME_DIMS,
            batch_size=1, epochs=1, bias_type=(1, 0, 1), freeze=(),
            is_early_stop=False, shuffle_train=False,
            videos_per_step=v_per, prefetch_decode=pref,
        )
        trainer = Trainer(
            cfg, video_dataset, "UAV2",
            str(tmp_path_factory.mktemp(f"w_pf{v_per}{pref}")), ext=".avi",
            priors_cache_dir=str(tmp_path_factory.mktemp(f"p_pf{v_per}{pref}")),
        )
        losses[pref] = trainer._run_epoch("train")
    assert losses[True] == pytest.approx(losses[False], rel=1e-6)


def test_infer_ragged_final_group(trained, video_dataset, tmp_path_factory):
    """videos_per_batch=2 with 3 pending videos: the final 1-video group is
    shape-padded with a discarded dummy so the compiled program is reused —
    all 3 salmaps written, nothing extra."""
    trainer, state, _ = trained
    src = tmp_path_factory.mktemp("ragged_vids")
    rng = np.random.RandomState(7)
    for name in ("ra", "rb", "rc"):
        _write_video(os.path.join(str(src), name + ".avi"), rng)
    out_path = str(tmp_path_factory.mktemp("ragged_out"))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    run_test_videos(
        str(src), out_path, trainer.model, variables,
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
        method_name="Rag", videos_per_batch=2,
    )
    written = sorted(os.listdir(os.path.join(out_path, "Rag")))
    assert written == ["ra.mat", "rb.mat", "rc.mat"]
    for f in written:
        sal = loadmat(os.path.join(out_path, "Rag", f), "salmap")
        assert sal.shape == (NATIVE_H, NATIVE_W, 1, NFRAMES)
        assert sal.max() == 255


def test_infer_lone_group_skips_padding(trained, tmp_path_factory, monkeypatch):
    """A LONE group smaller than videos_per_batch (single-chip, no injected
    AOT step) must run at its TRUE V: nothing is compiled yet, so padding to
    v_per would only buy dummy compute (regression: the skip condition once
    tested `infer_step is not None` after infer_step was already built,
    making it always true and padding every lone group)."""
    trainer, state, _ = trained
    src = tmp_path_factory.mktemp("lone_vids")
    _write_video(os.path.join(str(src), "only.avi"), np.random.RandomState(3))
    out_path = str(tmp_path_factory.mktemp("lone_out"))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    import iip_uavsal_saliency_tpu.runners.infer as infer_mod

    seen_v = []
    real_make = infer_mod.make_infer_step

    def spy_make(*a, **k):
        step = real_make(*a, **k)

        def wrapped(p, b, x, g, o, st):
            seen_v.append(int(x.shape[0]))
            return step(p, b, x, g, o, st)

        return wrapped

    monkeypatch.setattr(infer_mod, "make_infer_step", spy_make)
    run_test_videos(
        str(src), out_path, trainer.model, variables,
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
        method_name="Lone", videos_per_batch=4, bake_params=False,
    )
    assert seen_v and set(seen_v) == {1}, seen_v
    assert sorted(os.listdir(os.path.join(out_path, "Lone"))) == ["only.mat"]


def test_bf16_serving_metric_parity(trained, video_dataset, tmp_path_factory):
    """The DEFAULT serving path (serve_bf16=True + fold_bn=True, the exact
    config `cli test` runs) must hold the accuracy north star at the METRIC
    level: CC/NSS/SIM within 1% of the f32 reference path on the same videos
    (BASELINE.md tolerance; reference eval driver:
    utils_score_torch.py:473-582). This welds the FPS headline (measured on
    the bf16 path) to the accuracy claim (previously only tested in f32) —
    it fails if the default serving path ever drifts past the tolerance.

    On CPU the bf16 path runs the XLA TWA scan; the TPU Pallas kernel's
    equivalence to that scan is pinned separately (tests/test_pallas_twa.py)
    and the TPU-measured deltas are recorded in docs/PARITY.md."""
    trainer, state, final = trained
    res_dir = str(tmp_path_factory.mktemp("ResultsBF16"))
    out_path = os.path.join(res_dir, "Saliency")
    from iip_uavsal_saliency_tpu.runners.infer import load_model_for_inference

    common = dict(
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
    )
    # f32 reference leg: raw (unfolded) checkpoint, f32 compute
    model32, vars32 = load_model_for_inference(
        final, time_dims=TIME_DIMS, bias_type=(1, 0, 1), fold_bn=False
    )
    run_test_videos(video_dataset + "/Videos", out_path, model32, vars32,
                    method_name="F32", **common)
    # default serving leg: folded + bf16 (what cmd_test builds)
    model16, vars16 = load_model_for_inference(
        final, time_dims=TIME_DIMS, bias_type=(1, 0, 1), fold_bn=True
    )
    run_test_videos(video_dataset + "/Videos", out_path, model16, vars16,
                    method_name="BF16", compute_dtype=jnp.bfloat16, **common)

    # deterministic metrics only (CC/NSS/SIM/KLD need no random negatives)
    keys = ["NSS", "KLD", "SIM", "CC"]
    evalscores_vid(video_dataset, res_dir, "UAV2", ["F32", "BF16"],
                   keys_order=keys, batch_size=4, rng=np.random.RandomState(0))
    means = mean_scores(res_dir, ["F32", "BF16"], keys_order=keys, save=False)

    # |delta| <= max(1% relative, an absolute floor for the near-zero values
    # synthetic GT produces — on real data CC~0.6 makes 1% the binding term)
    floors = {"CC": 0.01, "SIM": 0.01, "NSS": 0.05, "KLD": 0.05}
    for k in keys:
        a, b = means["F32"][k], means["BF16"][k]
        tol = max(0.01 * abs(a), floors[k])
        assert abs(a - b) <= tol, (
            f"{k}: f32={a:.4f} bf16={b:.4f} |delta|={abs(a - b):.4f} > {tol:.4f}"
        )


def test_dp_serving_through_runner(trained, video_dataset, tmp_path_factory):
    """Multi-chip DP serving through the PRODUCTION runner (the --dp_devices
    CLI path): test_videos with a pure-'data' mesh shards the V axis over
    devices via make_infer_step's shard_map branch and must write the same
    salmaps as the single-device run (eval mode has no cross-video op, so
    per-device programs compute the same math; uint8 outputs may differ by
    float-rounding of at most one level)."""
    import jax as _jax

    from iip_uavsal_saliency_tpu.parallel.mesh import make_mesh

    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    common = dict(iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
                  bias_type=(1, 0, 1), videos_per_batch=2)
    out_sd = str(tmp_path_factory.mktemp("dp_sd"))
    out_dp = str(tmp_path_factory.mktemp("dp_dp"))
    run_test_videos(video_dataset + "/Videos", out_sd, trainer.model, variables,
                    method_name="SD", **common)
    mesh = make_mesh(n_data=2, devices=_jax.devices()[:2])
    run_test_videos(video_dataset + "/Videos", out_dp, trainer.model, variables,
                    method_name="DP", mesh=mesh, **common)
    for name in ("vid_a", "vid_b"):
        sd = loadmat(os.path.join(out_sd, "SD", name + ".mat"), "salmap")
        dp = loadmat(os.path.join(out_dp, "DP", name + ".mat"), "salmap")
        assert sd.shape == dp.shape
        diff = np.abs(sd.astype(np.int16) - dp.astype(np.int16))
        assert diff.max() <= 1, f"{name}: max uint8 diff {diff.max()}"


def test_baked_serving_matches_live(trained, video_dataset, tmp_path_factory):
    """bake_params=True (the serving default: params/stats/priors embedded
    as compile-time constants, parallel/steps.make_baked_infer_step) must
    write the same salmaps as the argument-passing step — XLA's constant
    folding may reassociate f32 ops, so the bound is one uint8 level."""
    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    common = dict(iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
                  bias_type=(1, 0, 1))
    out_b = str(tmp_path_factory.mktemp("bake_on"))
    out_a = str(tmp_path_factory.mktemp("bake_off"))
    run_test_videos(video_dataset + "/Videos", out_b, trainer.model, variables,
                    method_name="B", bake_params=True, **common)
    run_test_videos(video_dataset + "/Videos", out_a, trainer.model, variables,
                    method_name="A", bake_params=False, **common)
    for name in ("vid_a", "vid_b"):
        b = loadmat(os.path.join(out_b, "B", name + ".mat"), "salmap")
        a = loadmat(os.path.join(out_a, "A", name + ".mat"), "salmap")
        assert b.shape == a.shape
        diff = np.abs(b.astype(np.int16) - a.astype(np.int16))
        assert diff.max() <= 1, f"{name}: max uint8 diff {diff.max()}"


def test_dp_serving_ragged_single_group(trained, video_dataset, tmp_path_factory):
    """DP serving with FEWER videos than videos_per_batch (the resumed-run /
    tiny-dir case): a lone group of 1 video under a data=2 mesh must be
    dummy-padded so the V axis still shards — it used to skip padding for
    len(groups)==1 and crash in device_put/shard_map."""
    import shutil

    import jax as _jax

    from iip_uavsal_saliency_tpu.parallel.mesh import make_mesh

    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    one_dir = tmp_path_factory.mktemp("dp_one_in")
    shutil.copyfile(os.path.join(video_dataset, "Videos", "vid_a.avi"),
                    os.path.join(one_dir, "vid_a.avi"))
    out_sd = str(tmp_path_factory.mktemp("dp_one_sd"))
    out_dp = str(tmp_path_factory.mktemp("dp_one_dp"))
    common = dict(iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
                  bias_type=(1, 0, 1))
    run_test_videos(str(one_dir), out_sd, trainer.model, variables,
                    method_name="SD", **common)
    mesh = make_mesh(n_data=2, devices=_jax.devices()[:2])
    run_test_videos(str(one_dir), out_dp, trainer.model, variables,
                    method_name="DP", mesh=mesh, videos_per_batch=2, **common)
    sd = loadmat(os.path.join(out_sd, "SD", "vid_a.mat"), "salmap")
    dp = loadmat(os.path.join(out_dp, "DP", "vid_a.mat"), "salmap")
    assert sd.shape == dp.shape
    diff = np.abs(sd.astype(np.int16) - dp.astype(np.int16))
    assert diff.max() <= 1, f"max uint8 diff {diff.max()}"


def test_dp_mesh_cli_guard():
    """--dp_devices beyond the visible device count fails loudly."""
    import pytest as _pytest

    from iip_uavsal_saliency_tpu.cli import _dp_mesh
    from iip_uavsal_saliency_tpu.utils.config import Config

    assert _dp_mesh(Config(dp_devices=1)) is None
    with _pytest.raises(SystemExit, match="devices visible"):
        _dp_mesh(Config(dp_devices=999))
    mesh = _dp_mesh(Config(dp_devices=2))
    assert dict(mesh.shape)["data"] == 2


def test_infer_zoo_checkpoint(video_dataset, tmp_path_factory):
    """`test` must serve zoo-variant checkpoints: load_model_for_inference
    builds the named MODEL_ZOO class behind the stateful adapter (it used to
    hardcode UAVSal, crashing on a zoo param tree)."""
    from iip_uavsal_saliency_tpu.models import build_adapted_model, init_variables
    from iip_uavsal_saliency_tpu.runners.infer import load_model_for_inference
    from iip_uavsal_saliency_tpu.training.checkpoint import save_checkpoint

    h, w = IOSIZE[0], IOSIZE[1]
    model = build_adapted_model("uavsal_mp", time_dims=TIME_DIMS, num_stblock=1,
                                bias_type=(1, 0, 1))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, TIME_DIMS, h, w, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(h // 8, w // 8, 8).astype(np.float32))
    st = model.init_state(h, w, 1)
    variables = init_variables(model, jax.random.PRNGKey(0), x, g, None, st)
    ckpt = str(tmp_path_factory.mktemp("zoo_ck") / "zoo_final.ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats", {})})

    loaded, lvars = load_model_for_inference(
        ckpt, time_dims=TIME_DIMS, num_stblock=1, bias_type=(1, 0, 1),
        model_name="uavsal_mp",
    )
    out_path = str(tmp_path_factory.mktemp("zoo_out"))
    run_test_videos(
        video_dataset + "/Videos", out_path, loaded, lvars,
        iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS, bias_type=(1, 0, 1),
        method_name="ZooMP",
    )
    sal = loadmat(os.path.join(out_path, "ZooMP", "vid_a.mat"), "salmap")
    assert sal.shape == (NATIVE_H, NATIVE_W, 1, NFRAMES)


def test_epoch_checkpoint_carries_earlystop_bookkeeping(trained):
    """Epoch checkpoints persist min_val_loss/num_patience and a _best.ckpt
    snapshot, so --resume keeps the pre-crash best weights and patience
    instead of silently re-arming early stop."""
    trainer, state, final = trained
    prefix = os.path.join(os.path.dirname(final), "TinyUAVSal")
    from iip_uavsal_saliency_tpu.training.checkpoint import (
        latest_checkpoint, load_checkpoint,
    )

    latest = latest_checkpoint(os.path.dirname(final), "TinyUAVSal")
    ckpt = load_checkpoint(latest)
    assert np.isfinite(float(ckpt["min_val_loss"]))
    assert int(ckpt["num_patience"]) == 0  # epoch 0 is always the best so far
    best = load_checkpoint(prefix + "_best.ckpt")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        best["params"],
        jax.tree_util.tree_map(np.asarray,
                               jax.device_get(
                                   __import__("flax").serialization.to_state_dict(
                                       state.params))),
    )


def test_zero_step_epoch_reports_inf(trained, monkeypatch):
    """An epoch where every clip is skipped (empty GT) must report inf, not
    0.0 — 0.0 would win the early-stop comparison and freeze best weights
    at an untrained epoch."""
    trainer, _, _ = trained
    monkeypatch.setattr(trainer, "_video_clips", lambda *a, **k: [])
    assert trainer._run_epoch("val") == float("inf")


def test_visual_vid_frames_with_fix(video_dataset, tmp_path_factory):
    """The frame exporter honors with_fix: fixation dots burn to white
    (parity with the reference Tools/visualization_vid_frame.py; the
    parameter used to be silently ignored)."""
    import cv2

    from iip_uavsal_saliency_tpu.vis.overlay import visual_vid_frames

    res = str(tmp_path_factory.mktemp("vfres"))
    m_dir = os.path.join(res, "Saliency", "M")
    os.makedirs(m_dir)
    rng = np.random.RandomState(5)
    salmap = rng.randint(0, 255, (NATIVE_H, NATIVE_W, 1, NFRAMES), np.uint8)
    savemat(os.path.join(m_dir, "vid_a.mat"), {"salmap": salmap})

    visual_vid_frames(video_dataset, res, "UAV2", ["M"],
                      frame_indices=(0, 2), with_color=1, with_fix=1)
    out0 = os.path.join(m_dir, "Visual_frames", "vid_a_f00000.png")
    assert os.path.exists(out0)
    png = cv2.imread(out0)
    fixpts = loadmat(
        os.path.join(video_dataset, "fixations", "maps", "vid_a_fixPts.mat"),
        "fixLoc",
    )
    yy, xx = [int(v[0]) for v in np.nonzero(fixpts[:, :, 0, 0])]
    assert (png[yy, xx] == 255).all(), "fixation dot not burned to white"


def test_best_ckpt_written_before_epoch_ckpt(trained, monkeypatch):
    """A new-best epoch persists _best.ckpt BEFORE the epoch checkpoint that
    records the new min_val_loss: a crash between the two writes must never
    leave a resume whose min_val_loss points at weights that were never
    saved (the stale best would then shadow genuinely better later epochs)."""
    from types import SimpleNamespace

    import iip_uavsal_saliency_tpu.training.trainer as trmod

    trainer, _, _ = trained
    order = []
    real_save = trmod.save_checkpoint
    monkeypatch.setattr(
        trmod, "save_checkpoint",
        lambda path, payload: (order.append(os.path.basename(path)),
                               real_save(path, payload))[1],
    )
    # no device work: only the checkpoint/early-stop logic runs
    monkeypatch.setattr(trainer, "_run_epoch", lambda phase: 0.0)
    monkeypatch.setattr(
        trainer, "metrics",
        SimpleNamespace(scalar=lambda *a, **k: None, close=lambda: None),
    )
    trainer.train()
    best_i = order.index("TinyUAVSal_best.ckpt")
    epoch_i = next(i for i, n in enumerate(order) if "_00_" in n)
    assert best_i < epoch_i, order


def test_cli_three_stage_recipe(video_dataset, tmp_path_factory):
    """The reference's documented 3-stage recipe end-to-end from the CLI
    (reference: README.md:60 — ImageNet -> SRF-Net on SALICON -> full model):
    `train-img` produces an image-stage checkpoint, `train --model-path` it
    (the Trainer auto-detects the SRFNetImage tree and transplants the neck
    via transfer_sfnet), then `test` serves the trained model. The default
    freeze covers trunk/sfnet, so the final video checkpoint must carry the
    image stage's sfnet weights EXACTLY."""
    import scipy.io

    from iip_uavsal_saliency_tpu.cli import main as cli_main

    data_dir = str(tmp_path_factory.mktemp("cli3data"))
    save_dir = str(tmp_path_factory.mktemp("cli3weights"))
    priors = str(tmp_path_factory.mktemp("cli3priors"))

    # stage-1 data: tiny SALICON layout under <data_dir>/salicon-15
    rng = np.random.RandomState(0)
    for classes, n in [("train", 4), ("val", 2)]:
        base = os.path.join(data_dir, "salicon-15", classes)
        for d in ["images", "maps", os.path.join("fixations", "maps")]:
            os.makedirs(os.path.join(base, d), exist_ok=True)
        for i in range(n):
            name = f"img_{i:03d}"
            cv2.imwrite(os.path.join(base, "images", name + ".jpg"),
                        rng.randint(0, 255, (32, 48, 3), np.uint8))
            cv2.imwrite(os.path.join(base, "maps", name + ".png"),
                        rng.randint(0, 255, (32, 48), np.uint8))
            fix = (rng.rand(32, 48) > 0.97).astype(np.uint8)
            fix[16, 24] = 1
            scipy.io.savemat(
                os.path.join(base, "fixations", "maps", name + ".mat"),
                {"I": fix},
            )
    # stage-2/3 data: the synthetic video fixture, linked in under the exact
    # dataset names so cfg.ext resolves to .avi; Results/ land in OUR tmp
    # UAV2-TE dir, keeping the shared fixture pristine
    os.symlink(video_dataset, os.path.join(data_dir, "UAV2"))
    os.makedirs(os.path.join(data_dir, "UAV2-TE"))
    os.symlink(os.path.join(video_dataset, "Videos"),
               os.path.join(data_dir, "UAV2-TE", "Videos"))

    common = [
        "--data_dir", data_dir, "--save_model_dir", save_dir,
        "--priors_cache_dir", priors, "--method_name", "E2E",
        "--epochs", "1", "--is_early_stop", "false",
    ]
    rc = cli_main(["train-img", "--img_iosize", "64,64,8,8",
                   "--batch_size", "2"] + common)
    assert rc == 0
    img_ckpt = os.path.join(save_dir, "E2E_srfnet", "E2E_srfnet_final.ckpt")
    assert os.path.exists(img_ckpt)

    rc = cli_main(["train", "--model-path", img_ckpt,
                   "--iosize", "64,64,8,8", "--time_dims", "2",
                   "--batch_size", "1", "--bias_type", "1,0,1"] + common)
    assert rc == 0
    vid_ckpt = os.path.join(save_dir, "E2E", "E2E_final.ckpt")
    assert os.path.exists(vid_ckpt)

    # the transplanted (and frozen-by-default) neck survives training intact
    img_vars = load_checkpoint(img_ckpt)
    vid_vars = load_checkpoint(vid_ckpt)
    got = vid_vars["params"]["trunk"]["sfnet"]["conv_last"]["conv"]["kernel"]
    want = img_vars["params"]["sfnet"]["conv_last"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    rc = cli_main(["test", "--iosize", "64,64,8,8", "--time_dims", "2",
                   "--test_batch_size", "2", "--bias_type", "1,0,1"] + common)
    assert rc == 0
    sal_dir = os.path.join(data_dir, "UAV2-TE", "Results", "Results_E2E",
                           "Saliency", "E2E")
    mats = sorted(os.listdir(sal_dir))
    assert mats == ["vid_a.mat", "vid_b.mat"]
    sal = loadmat(os.path.join(sal_dir, "vid_a.mat"), "salmap")
    assert sal.shape == (NATIVE_H, NATIVE_W, 1, NFRAMES) and sal.dtype == np.uint8


def test_baked_dp_serving_matches_argument_dp(trained, video_dataset,
                                              tmp_path_factory):
    """Baked-constant serving composes with multi-chip DP (round 5:
    make_baked_infer_step(mesh=...) wraps the baked per-device program in
    shard_map over 'data'): on a data=2 mesh the baked step must write the
    same salmaps as the argument-passing shard_map step, to the one-uint8
    constant-folding tolerance."""
    import jax as _jax

    from iip_uavsal_saliency_tpu.parallel.mesh import make_mesh

    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh(n_data=2, devices=_jax.devices()[:2])
    common = dict(iosize=IOSIZE, batch_size=1, time_dims=TIME_DIMS,
                  bias_type=(1, 0, 1), videos_per_batch=2, mesh=mesh)
    out_b = str(tmp_path_factory.mktemp("dpbake_on"))
    out_a = str(tmp_path_factory.mktemp("dpbake_off"))
    run_test_videos(video_dataset + "/Videos", out_b, trainer.model, variables,
                    method_name="B", bake_params=True, **common)
    run_test_videos(video_dataset + "/Videos", out_a, trainer.model, variables,
                    method_name="A", bake_params=False, **common)
    for name in ("vid_a", "vid_b"):
        b = loadmat(os.path.join(out_b, "B", name + ".mat"), "salmap")
        a = loadmat(os.path.join(out_a, "A", name + ".mat"), "salmap")
        assert b.shape == a.shape
        diff = np.abs(b.astype(np.int16) - a.astype(np.int16))
        assert diff.max() <= 1, f"{name}: max uint8 diff {diff.max()}"


def test_baked_step_rejects_nondata_mesh(trained):
    """Baking buys nothing under GSPMD resharding; a mesh with a non-'data'
    axis > 1 must be rejected loudly, not silently serve slower."""
    import jax as _jax
    import pytest as _pytest

    from iip_uavsal_saliency_tpu.parallel.mesh import make_mesh
    from iip_uavsal_saliency_tpu.parallel.steps import make_baked_infer_step

    trainer, state, final = trained
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh = make_mesh(n_data=2, n_spatial=2, devices=_jax.devices()[:4])
    with _pytest.raises(ValueError, match="pure-'data' mesh"):
        make_baked_infer_step(trainer.model, variables, mesh=mesh)
