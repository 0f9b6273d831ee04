"""Dataclass + CLI config layer.

The reference's config is module-level globals in config.py, shadowed by
inline blocks in each demo (reference: config.py:11-59,
Demo_Train_Test.py:243-280 — SURVEY.md §5 calls out the duplication). Here a
single dataclass holds paths + run settings, loadable from JSON and
overridable from CLI `--key value` flags.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Config:
    # datasets
    data_dir: str = os.environ.get("UAVSAL_DATA_DIR", "/data/DataSet")
    train_dataset: str = "UAV2"
    test_dataset: str = "UAV2-TE"

    # run layout (reference: Demo_Train_Test.py:267-275)
    save_model_dir: str = "./weights/temp_weights/"
    pre_model_path: str = ""
    priors_cache_dir: str = ""

    # model / training hyperparameters
    method_name: str = "UAVSal"
    model_name: str = "uavsal"  # any models.MODEL_ZOO name
    cnn_type: str = "mobilenet_v2"
    iosize: Tuple[int, int, int, int] = (360, 640, 45, 80)
    # SALICON image-stage iosize for `train-img` (reference: dataset.py:90)
    img_iosize: Tuple[int, int, int, int] = (480, 640, 60, 80)
    time_dims: int = 5
    num_stblock: int = 2
    # ST-block ordering for the uavsal_stblocks_type ablation: st / s2t /
    # t2s / s_s2t (reference: model.py:708-758); other models ignore it
    st_type: str = "st"
    bias_type: Tuple[int, int, int] = (1, 1, 1)
    batch_size: int = 2
    test_batch_size: int = 4
    eval_batch_size: int = 32
    epochs: int = 20
    learning_rate: float = 1e-4
    weight_decay: float = 5e-5
    is_early_stop: bool = True
    max_patience: int = 4
    is_best_only: bool = False
    shuffle_train: bool = True
    num_workers: int = 4
    videos_per_step: int = 1   # >1: multi-video data-parallel training
    resume: bool = False       # continue from the latest epoch checkpoint
    mixed_precision: bool = False  # bf16 train compute, f32 masters (~2x)
    remat: bool = False        # recompute fwd in bwd: larger clips per chip
    donate: bool = False       # in-place TrainState: less HBM, measured slower
    prefetch_decode: bool = True  # train: decode video k+1 while k steps
    videos_per_batch: int = 1  # >1: batched multi-video inference
    # >1: data-parallel over N local devices — train shards videos_per_step,
    # test shards videos_per_batch (both must be multiples of dp_devices)
    dp_devices: int = 1
    serve_bf16: bool = True    # bf16 serving path for `test` (f32: parity)
    # embed params/priors as compile-time constants in the serving program
    # (+11.7% measured, composes with --dp_devices DP serving — docs/PERF.md
    # "Baked-constant serving")
    bake_params: bool = True
    fold_bn: bool = True       # fold eval BN into convs at serving load
    # serve with the exact space-to-depth stem reparametrization (same
    # checkpoints; ops.layers.S2DStem — A/B numbers in docs/PERF.md)
    s2d_stem: bool = False
    # `export` target platforms, comma-separated (e.g. "tpu" to cross-lower
    # from a CPU host); empty = the current backend
    export_platforms: str = ""
    # AUC-Borji/shuffled on device (False: host path). None = default: device
    # for video eval (measured 5.5x), auto for image eval — device only on a
    # LOCAL ACCELERATOR (relay RTT and CPU backends both measured slower;
    # scorer._resolve_img_device_auc has the numbers)
    device_auc: Optional[bool] = None

    @property
    def ext(self) -> str:
        # Single source of truth: data.lists.dataset_ext covers UAV2/UAV2-TE/
        # CITIUS → .avi, else .mp4 (reference: Demo_Train_Test.py:277-280).
        from ..data.lists import dataset_ext

        return dataset_ext(self.train_dataset)

    @property
    def train_data_dir(self) -> str:
        return os.path.join(self.data_dir, self.train_dataset)

    @property
    def test_data_dir(self) -> str:
        return os.path.join(self.data_dir, self.test_dataset)

    @property
    def test_input_path(self) -> str:
        return os.path.join(self.test_data_dir, "Videos")

    @property
    def test_result_path(self) -> str:
        return os.path.join(self.test_data_dir, "Results", f"Results_{self.method_name}")

    @property
    def test_output_path(self) -> str:
        return os.path.join(self.test_result_path, "Saliency")


def load_config(path: Optional[str] = None, argv: Optional[Sequence[str]] = None) -> Config:
    """Config from optional JSON file + `--key value` CLI overrides."""
    cfg = Config()
    if path:
        if not os.path.exists(path):
            # silently falling back to defaults here launches a whole run
            # with the wrong paths/lr/epochs on a typo'd filename
            raise SystemExit(f"config file not found: {path}")
        with open(path) as f:
            data = json.load(f)
        cfg = dataclasses.replace(cfg, **data)
    if argv:
        fields = {f.name: f for f in dataclasses.fields(Config)}
        i = 0
        updates = {}
        while i < len(argv):
            arg = argv[i]
            if arg.startswith("--"):
                key = arg[2:].replace("-", "_")
                if key not in fields:
                    raise SystemExit(f"unknown flag --{key}")
                if i + 1 >= len(argv):
                    raise SystemExit(f"flag --{key} needs a value")
                raw = argv[i + 1]
                ftype = fields[key].type
                if "Tuple" in str(ftype) or "tuple" in str(ftype):
                    val = tuple(int(x) for x in raw.strip("()[]").split(","))
                elif ftype in ("int", int):
                    val = int(raw)
                elif ftype in ("float", float):
                    val = float(raw)
                elif ftype in ("bool", bool):
                    val = raw.lower() in ("1", "true", "yes")
                elif "Optional[bool]" in str(ftype):  # tri-state: auto/true/false
                    val = (None if raw.lower() in ("none", "auto")
                           else raw.lower() in ("1", "true", "yes"))
                else:
                    val = raw
                updates[key] = val
                i += 2
            else:
                # silently skipping would launch a run with defaults on a
                # typo like '-resume true' (missing dash) — fail instead
                raise SystemExit(f"unexpected argument {arg!r} (flags are --key value)")
        cfg = dataclasses.replace(cfg, **updates)
    return cfg
