"""Whole-video dataset iterators with background prefetch.

TPU-native equivalents of the reference's torch Dataset/DataLoader wrappers
(reference: dataset.py — VideoData :119-164, read_traindata_list/TrainData
:167-227, TestData :230-263). Layouts are NHWC (the reference transposes to
NCHW for torch); items are plain numpy so the caller controls device
placement (`jax.device_put` overlaps with the next item's host decode thanks
to the prefetch thread).

- `video_dataset`    == VideoData: txt-split videos + GT, letterboxed;
- `traindata_dataset`== TrainData: pre-packed `<root>/vidmat/<v>.mat`
  ("videos", "oh", "ow") + `<root>/labels/<v>.mat` ("gazemap") tensors;
- `test_dataset`     == TestData: a bare directory of videos.

Each returns (names, iterator); the iterator yields per-video tuples and
decodes `prefetch` items ahead in a daemon thread.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .lists import read_video_list
from .matio import loadmat
from .video import preprocess_videos, preprocess_vidfixs, preprocess_vidmaps

VIDEO_EXTS = (".avi", ".AVI", ".mp4")


def _prefetched(items: Sequence, load: Callable, prefetch: int) -> Iterator:
    """Background-decoded iterator. Producer exceptions are re-raised in the
    consumer (a dead thread must not look like a clean end-of-dataset)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
    stop = object()

    def producer():
        try:
            for it in items:
                q.put(load(it))
            q.put(stop)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put(e)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def video_dataset(
    root: str,
    classes: str = "train",
    max_frames: float = float("inf"),
    iosize: Sequence[int] = (360, 640, 45, 80),
    ext: str = ".avi",
    shuffle: bool = False,
    rng: Optional[random.Random] = None,
    prefetch: int = 2,
):
    """Per-video (name, frames_u8 (T,H,W,3), gaze (T,Ho,Wo,2)) iterator; for
    classes='test' yields (name, frames_u8, nframes, height, width)."""
    shape_r, shape_c, shape_r_out, shape_c_out = iosize
    vids, maps, fixs = read_video_list(root, classes, shuffle=False, ext=ext)
    order = list(range(len(vids)))
    if shuffle:
        (rng or random).shuffle(order)

    def load(i):
        name = vids[i]
        imgs, nframes, height, width = preprocess_videos(
            vids[i], shape_r, shape_c, max_frames, mode="RGB", normalize=False
        )
        if classes.lower() == "test":
            return name, imgs, nframes, height, width
        vidmaps = preprocess_vidmaps(maps[i], shape_r_out, shape_c_out, max_frames)
        vidfixs = preprocess_vidfixs(fixs[i], shape_r_out, shape_c_out, max_frames)
        nframes = min(vidfixs.shape[0], vidmaps.shape[0], nframes)
        gaze = np.concatenate([vidmaps[:nframes], vidfixs[:nframes]], axis=-1)
        return name, imgs[:nframes], gaze

    return [vids[i] for i in order], _prefetched(order, load, prefetch)


def read_traindata_list(
    root: str, phase_gen: str = "train", shuffle: bool = True,
    rng: Optional[random.Random] = None,
) -> Tuple[List[str], List[str]]:
    """Pre-packed tensor lists: `<root>/vidmat/<v>.mat` + `<root>/labels/<v>.mat`
    (reference: dataset.py:167-185)."""
    if phase_gen not in ("train", "val", "test"):
        raise NotImplementedError(phase_gen)
    with open(os.path.join(root, "txt", phase_gen + ".txt")) as f:
        lines = sorted(line.strip("\n") for line in f)
    if shuffle:
        (rng or random).shuffle(lines)
    videos = [os.path.join(root, "vidmat", name + ".mat") for name in lines]
    labels = [os.path.join(root, "labels", name + ".mat") for name in lines]
    return videos, labels


def traindata_dataset(
    root: str,
    classes: str = "train",
    max_frames: float = float("inf"),
    shuffle: bool = False,
    prefetch: int = 2,
):
    """Pre-packed tensors: yields (name, videos, gazemap); for classes='test'
    yields (name, videos, nframes, oh, ow) (reference: dataset.py:188-227)."""
    videos, labels = read_traindata_list(root, classes, shuffle=shuffle)

    def load(i):
        name = videos[i]
        viddata = loadmat(videos[i])
        imgs = viddata["videos"]
        if classes.lower() == "test":
            return name, imgs, int(min(imgs.shape[0], max_frames)), viddata["oh"], viddata["ow"]
        gaze = loadmat(labels[i], "gazemap")
        nframes = int(min(imgs.shape[0], gaze.shape[0], max_frames))
        return name, imgs[:nframes], gaze[:nframes]

    return videos, _prefetched(range(len(videos)), load, prefetch)


def test_dataset(
    root: str,
    max_frames: float = float("inf"),
    iosize: Sequence[int] = (360, 640, 45, 80),
    prefetch: int = 2,
):
    """Directory-of-videos: yields (name, frames_u8, nframes, height, width)
    (reference: dataset.py:230-263)."""
    shape_r, shape_c = iosize[0], iosize[1]
    vids = sorted(
        os.path.join(root, f) for f in os.listdir(root) if f.endswith(VIDEO_EXTS)
    )

    def load(i):
        imgs, nframes, height, width = preprocess_videos(
            vids[i], shape_r, shape_c, max_frames, mode="RGB", normalize=False
        )
        return vids[i], imgs, nframes, height, width

    return vids, _prefetched(range(len(vids)), load, prefetch)
