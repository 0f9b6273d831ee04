"""Dataset split / file-list management.

Parity with the reference's txt-based split handling
(reference: utils_data.py:98-202): `<DS>/txt/{train,val,test}.txt` hold video
basenames; videos live under `<DS>/Videos/`, blurred GT under `<DS>/maps/
<vid>_fixMaps.mat`, fixation points under `<DS>/fixations/maps/<vid>_fixPts.mat`.
"""

from __future__ import annotations

import os
import random
from typing import List, Sequence, Tuple

VIDEO_EXTS = (".mp4", ".avi", ".AVI")


def shuffle_data_dir(
    data_path: str, ratio: float = 0.8, shuffle: bool = True, save_txt: bool = True,
    txt_subdir: str = "",
) -> Tuple[List[str], List[str]]:
    """80/20 split of `<data_path>/videos/` into train/val lists
    (reference: utils_data.py:98-124).

    NOTE (reference quirk kept): like the reference, this scans lowercase
    `videos/` and writes the txt files to the DATASET ROOT, while
    read_video_list reads `<root>/txt/` and `Videos/` — pass
    txt_subdir="txt" to write where read_video_list looks."""
    vid_dir = os.path.join(data_path, "videos")
    images = [f for f in os.listdir(vid_dir) if f.endswith(VIDEO_EXTS)]
    if shuffle:
        random.shuffle(images)
    n = int(len(images) * ratio)
    train_images, val_images = sorted(images[:n]), sorted(images[n:])
    if save_txt:
        out_dir = os.path.join(data_path, txt_subdir) if txt_subdir else data_path
        os.makedirs(out_dir, exist_ok=True)
        for name, lst in (("train", train_images), ("val", val_images)):
            with open(os.path.join(out_dir, name + ".txt"), "w") as f:
                f.writelines(str(line) + "\n" for line in lst)
    return train_images, val_images


def shuffle_data_list(
    list_path: str, ratio: float = 0.8, shuffle: bool = True, save_txt: bool = True
) -> Tuple[List[str], List[str]]:
    """Split an existing list file (reference: utils_data.py:126-154)."""
    data_path = os.path.dirname(list_path)
    with open(list_path) as f:
        images = [line.strip("\n") for line in f]
    if shuffle:
        random.shuffle(images)
    n = int(len(images) * ratio)
    train_images, val_images = sorted(images[:n]), sorted(images[n:])
    if save_txt:
        for name, lst in (("train", train_images), ("val", val_images)):
            with open(os.path.join(data_path, name + ".txt"), "w") as f:
                f.writelines(str(line) + "\n" for line in lst)
    return train_images, val_images


def read_video_list(
    datapath: str, phase_gen: str = "train", shuffle: bool = True, ext: str = ".mp4"
) -> Tuple[List[str], List[str], List[str]]:
    """Resolve (videos, fixMaps, fixPts) paths from the txt split
    (reference: utils_data.py:157-178)."""
    if phase_gen not in ("train", "val", "test"):
        raise NotImplementedError(phase_gen)
    txt_path = os.path.join(datapath, "txt", phase_gen + ".txt")
    with open(txt_path) as f:
        # strip whitespace/CRLF and drop blank lines: a Windows-edited or
        # trailing-newline txt otherwise yields names like 'vid01\r' or ''
        lines = sorted(line.strip() for line in f if line.strip())
    if shuffle:
        random.shuffle(lines)
    names = lines
    videos = [os.path.join(datapath, "Videos", n + ext) for n in names]
    vidmaps = [os.path.join(datapath, "maps", n + "_fixMaps.mat") for n in names]
    vidfixs = [os.path.join(datapath, "fixations", "maps", n + "_fixPts.mat") for n in names]
    return videos, vidmaps, vidfixs


def get_video_list(
    datapath: str, phase_gen: str = "train", shuffle: bool = True
) -> Tuple[Sequence[str], Sequence[str], Sequence[str]]:
    """Directory-scan variant (reference: utils_data.py:180-202)."""
    if phase_gen not in ("train", "val", "test"):
        raise NotImplementedError(phase_gen)
    base = os.path.join(datapath, phase_gen)
    vid_dir = os.path.join(base, "videos")
    map_dir = os.path.join(base, "maps")
    fix_dir = os.path.join(base, "fixations", "maps")
    # Sort each listing BEFORE pairing: os.listdir order is arbitrary and
    # per-directory, so zipping raw listings can pair video A with video B's
    # ground truth. Sorted name order aligns because GT files share the
    # video's basename (+ fixed suffixes).
    videos = sorted(
        os.path.join(vid_dir, f) for f in os.listdir(vid_dir) if f.endswith(VIDEO_EXTS)
    )
    vidmaps = sorted(
        os.path.join(map_dir, f) for f in os.listdir(map_dir) if f.endswith(".mat")
    )
    vidfixs = sorted(
        os.path.join(fix_dir, f) for f in os.listdir(fix_dir) if f.endswith(".mat")
    )
    if not (len(videos) == len(vidmaps) == len(vidfixs)):
        raise ValueError(
            f"unpaired dataset listing under {base}: {len(videos)} videos, "
            f"{len(vidmaps)} fixMaps, {len(vidfixs)} fixPts"
        )
    if shuffle:
        zipped = list(zip(videos, vidmaps, vidfixs))
        random.shuffle(zipped)
        videos, vidmaps, vidfixs = map(list, zip(*zipped))
    return videos, vidmaps, vidfixs


def dataset_ext(dataset: str) -> str:
    """Video container per dataset (reference: Demo_Train_Test.py:277-280)."""
    return ".avi" if dataset.upper() in ("UAV2", "UAV2-TE", "CITIUS") else ".mp4"
