"""Command-line pipelines: the Demo_* entry points as subcommands.

Equivalent orchestration to the reference's demo scripts
(reference: Demo_Train_Test.py:283-303 train->test->eval->visualize,
Demo_Test.py:99-130 test->eval->visualize, Tools/* standalone drivers), with
the shared dataclass config (utils/config.py) instead of per-script global
blocks.

    python -m iip_uavsal_saliency_tpu train      [--config cfg.json] [--key value ...]
                                                 [--dp_devices N]  # multi-chip DP
    python -m iip_uavsal_saliency_tpu train-img  # SALICON SRF-Net pretraining
    python -m iip_uavsal_saliency_tpu test       [--model-path ...]
    python -m iip_uavsal_saliency_tpu eval       [--methods A,B]
    python -m iip_uavsal_saliency_tpu eval-img   [--methods A,B]
    python -m iip_uavsal_saliency_tpu vis        [--methods A,B|GT] [--with-fix] [--frames 0,5,10]
    python -m iip_uavsal_saliency_tpu convert ref.pth out.ckpt [--model_name uavsal]
    python -m iip_uavsal_saliency_tpu export ckpt.ckpt out.aot [--export_platforms tpu]
    python -m iip_uavsal_saliency_tpu test-aot out.aot           # serve the artifact
    python -m iip_uavsal_saliency_tpu modelsize
    python -m iip_uavsal_saliency_tpu pipeline   # train -> test -> eval -> vis
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Sequence

from .utils.config import Config, load_config
from .utils.logging import get_logger

log = get_logger("cli")


def _split_cli(argv: Sequence[str], cmd: str = "vis"):
    """Extract --config/--methods/--model-path/--frames/--with-fix; pass the
    rest to load_config. Returns (cfg_path, methods, vis_opts, rest).

    --frames/--with-fix are only meaningful where vis runs: `vis` itself and
    `pipeline` (whose last stage is cmd_vis, which receives them). Any other
    subcommand rejects them outright (same contract as load_config's
    unknown-flag error: silently dropping a flag would launch a long run
    missing it)."""
    argv = list(argv)
    cfg_path, methods = None, None
    vis_opts = {"frames": None, "with_fix": 0}
    rest: List[str] = []
    i = 0
    while i < len(argv):
        if argv[i] in ("--with-fix", "--frames") and cmd not in ("vis", "pipeline"):
            raise SystemExit(
                f"flag {argv[i]} is only valid for the vis and pipeline commands"
            )
        if argv[i] == "--with-fix":
            vis_opts["with_fix"] = 1
            i += 1
            continue
        if argv[i] in ("--config", "--methods", "--model-path", "--frames"):
            if i + 1 >= len(argv):
                raise SystemExit(f"flag {argv[i]} needs a value")
            if argv[i] == "--config":
                cfg_path = argv[i + 1]
            elif argv[i] == "--methods":
                methods = argv[i + 1].split(",")
            elif argv[i] == "--frames":
                try:
                    vis_opts["frames"] = [int(v) for v in argv[i + 1].split(",")]
                except ValueError:
                    raise SystemExit(
                        f"--frames wants comma-separated ints, got {argv[i + 1]!r}"
                    )
            else:
                rest += ["--pre_model_path", argv[i + 1]]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    return cfg_path, methods, vis_opts, rest


def _dp_mesh(cfg: Config):
    """Pure-'data' mesh over the first dp_devices local devices (or None).
    Multi-chip data parallelism for both training (videos_per_step shards)
    and serving (videos_per_batch shards via shard_map) — a capability the
    reference lacks entirely (it pins one GPU, Demo_Train_Test.py:7)."""
    if cfg.dp_devices <= 1:
        return None
    import jax

    from .parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    if cfg.dp_devices > n_dev:
        raise SystemExit(
            f"--dp_devices {cfg.dp_devices} but only {n_dev} devices visible"
        )
    return make_mesh(n_data=cfg.dp_devices, devices=jax.devices()[: cfg.dp_devices])


def cmd_train(cfg: Config):
    from .training.trainer import TrainConfig, Trainer

    tc = TrainConfig(
        method_name=cfg.method_name,
        model_name=cfg.model_name,
        cnn_type=cfg.cnn_type,
        iosize=cfg.iosize,
        time_dims=cfg.time_dims,
        num_stblock=cfg.num_stblock,
        st_type=cfg.st_type,
        bias_type=cfg.bias_type,
        batch_size=cfg.batch_size,
        epochs=cfg.epochs,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        is_early_stop=cfg.is_early_stop,
        max_patience=cfg.max_patience,
        is_best_only=cfg.is_best_only,
        shuffle_train=cfg.shuffle_train,
        videos_per_step=cfg.videos_per_step,
        resume=cfg.resume,
        mixed_precision=cfg.mixed_precision,
        remat=cfg.remat,
        donate=cfg.donate,
        prefetch_decode=cfg.prefetch_decode,
    )
    pre_vars = None
    if cfg.pre_model_path:
        # --model-path accepts BOTH a video-model checkpoint (warm start /
        # fine-tune) and a SALICON image-stage checkpoint from `train-img`
        # (the Trainer detects the SRFNetImage tree and transplants the
        # pretrained neck via models.transfer_sfnet — the reference's
        # 3-stage recipe, README.md:60).
        from .training.checkpoint import load_checkpoint

        ckpt = load_checkpoint(cfg.pre_model_path)
        pre_vars = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    trainer = Trainer(
        tc,
        cfg.train_data_dir,
        cfg.train_dataset,
        cfg.save_model_dir,
        ext=cfg.ext,
        pre_variables=pre_vars,
        priors_cache_dir=cfg.priors_cache_dir,
        mesh=_dp_mesh(cfg),
    )
    trainer.train()


def cmd_train_img(cfg: Config):
    """SALICON SRF-Net pretraining stage (reference pipeline README.md:60).
    Pass the resulting `<method>_srfnet_final.ckpt` as --model-path to
    `train`: the Trainer detects the image-stage tree and transplants the
    pretrained neck via models.transfer_sfnet automatically."""
    from .training.image_trainer import ImageTrainConfig, train_salicon

    tc = ImageTrainConfig(
        method_name=f"{cfg.method_name}_srfnet",
        cnn_type=cfg.cnn_type,
        iosize=cfg.img_iosize,
        batch_size=cfg.batch_size,
        epochs=cfg.epochs,
        learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
        is_early_stop=cfg.is_early_stop,
        max_patience=cfg.max_patience,
    )
    data_root = os.path.join(cfg.data_dir, "salicon-15")
    train_salicon(tc, data_root, cfg.save_model_dir)


def _final_ckpt(cfg: Config) -> str:
    if cfg.pre_model_path:
        return cfg.pre_model_path
    return os.path.join(cfg.save_model_dir, cfg.method_name, f"{cfg.method_name}_final.ckpt")


def cmd_test(cfg: Config):
    from .runners.infer import load_model_for_inference, test_videos

    model, variables = load_model_for_inference(
        _final_ckpt(cfg),
        cnn_type=cfg.cnn_type,
        time_dims=cfg.time_dims,
        num_stblock=cfg.num_stblock,
        bias_type=cfg.bias_type,
        model_name=cfg.model_name,
        st_type=cfg.st_type,
        fold_bn=cfg.fold_bn,
        s2d_stem=cfg.s2d_stem,
    )
    import jax.numpy as jnp

    test_videos(
        cfg.test_input_path,
        cfg.test_output_path,
        model,
        variables,
        iosize=cfg.iosize,
        batch_size=cfg.test_batch_size,
        time_dims=cfg.time_dims,
        bias_type=cfg.bias_type,
        train_data_dir=cfg.train_data_dir,
        dataset=cfg.train_dataset,
        priors_cache_dir=cfg.priors_cache_dir,
        method_name=cfg.method_name,
        videos_per_batch=cfg.videos_per_batch,
        compute_dtype=jnp.bfloat16 if cfg.serve_bf16 else None,
        mesh=_dp_mesh(cfg),
        bake_params=cfg.bake_params,
    )


def cmd_eval(cfg: Config, methods: Optional[Sequence[str]]):
    from .evaluation.scorer import evalscores_vid, mean_scores

    methods = methods or [cfg.method_name]
    evalscores_vid(
        cfg.test_data_dir,
        cfg.test_result_path,
        cfg.test_dataset,
        methods,
        batch_size=cfg.eval_batch_size,
        # video eval: device sweep is a measured 5.5x win even through the
        # relay (uint8 shipping); only an explicit False opts out
        device_auc=cfg.device_auc if cfg.device_auc is not None else True,
    )
    means = mean_scores(cfg.test_result_path, methods)
    for m, scores in means.items():
        log.info("%s mean scores: %s", m, {k: round(v, 4) for k, v in scores.items()})


def cmd_eval_img(cfg: Config, methods: Optional[Sequence[str]]):
    from .evaluation.scorer import evalscores_img, mean_scores_img

    methods = methods or [cfg.method_name]
    data_dir = os.path.join(cfg.data_dir, "salicon-15", "val")
    res_dir = os.path.join(data_dir, "Results", f"Results_{cfg.method_name}")
    evalscores_img(data_dir, res_dir, "SALICON", methods, device_auc=cfg.device_auc)
    mean_scores_img(res_dir, methods)


def cmd_vis(cfg: Config, methods: Optional[Sequence[str]],
            frames: Optional[Sequence[int]] = None, with_fix: int = 0):
    """Overlay videos, or per-frame PNGs with --frames i,j,k (methods may
    include 'GT' to overlay the ground-truth fixMaps; reference:
    utils_vis.py:103-213, Tools/visualization_vid_frame.py)."""
    methods = methods or [cfg.method_name]
    if frames is not None:
        from .vis.overlay import visual_vid_frames

        visual_vid_frames(
            cfg.test_data_dir, cfg.test_result_path, cfg.test_dataset, methods,
            frame_indices=frames, with_color=1, with_fix=with_fix,
        )
        return
    from .vis.overlay import visual_vid

    visual_vid(
        cfg.test_data_dir, cfg.test_result_path, cfg.test_dataset, methods,
        with_color=1, with_fix=with_fix,
    )


def cmd_convert(cfg: Config, src: str, dst: str) -> None:
    """Published reference .pth -> our checkpoint, no Python required
    (reference user flow: download UAVSal_*.pth, README.md:42-44; the .pth
    is a pickled module loaded via torch.load().state_dict(),
    Demo_Test.py:33-39). Together with `test`/`eval` this makes the
    released-weights path three commands:

        python -m iip_uavsal_saliency_tpu convert UAVSal_UAV2.pth uavsal.ckpt
        python -m iip_uavsal_saliency_tpu test --model-path uavsal.ckpt
        python -m iip_uavsal_saliency_tpu eval

    torch (CPU is enough) is needed only for this command — a clear error
    says so if it's absent. `--model_name`/`--num_stblock`/`--bias_type`/
    `--st_type` select the ablation layout of the source checkpoint.
    """
    try:
        import torch  # noqa: F401
    except ImportError:
        raise SystemExit(
            "the convert command needs PyTorch (CPU build is enough) to "
            "unpickle the reference .pth; install torch or convert on a "
            "machine that has it — every other command runs without torch"
        )
    if not os.path.exists(src):
        raise SystemExit(f"checkpoint not found: {src}")
    from .models.convert import convert_zoo_state_dict, load_torch_checkpoint
    from .training.checkpoint import save_checkpoint

    sd = load_torch_checkpoint(src)
    variables = convert_zoo_state_dict(
        cfg.model_name, sd, num_stblock=cfg.num_stblock,
        bias_type=cfg.bias_type, st_type=cfg.st_type,
    )
    save_checkpoint(
        dst, {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    log.info("converted %s (%s) -> %s", src, cfg.model_name, dst)


def cmd_export(cfg: Config, src: str, dst: str) -> None:
    """Checkpoint -> one self-contained AOT serving artifact (weights,
    priors, fold, bf16 policy, and serving shape baked in — runners/export).
    Serve it anywhere with `test-aot out.aot`; no model code, checkpoint,
    or prior files needed at the destination. The serving shape is frozen
    at export time from --iosize/--test_batch_size/--videos_per_batch."""
    if not os.path.exists(src):
        raise SystemExit(f"checkpoint not found: {src}")
    from .runners.export import export_serving, save_exported
    from .runners.infer import load_model_for_inference

    model, variables = load_model_for_inference(
        src, cnn_type=cfg.cnn_type, time_dims=cfg.time_dims,
        num_stblock=cfg.num_stblock, bias_type=cfg.bias_type,
        model_name=cfg.model_name, st_type=cfg.st_type, fold_bn=cfg.fold_bn,
        s2d_stem=cfg.s2d_stem,
    )
    shape_r_out, shape_c_out = cfg.iosize[2], cfg.iosize[3]
    gauss = ob = None
    if cfg.bias_type[0]:
        from .data.priors import get_gauss_priors

        gauss = get_gauss_priors(shape_r_out, shape_c_out, 8, cfg.priors_cache_dir)
    if cfg.bias_type[1]:
        from .data.priors import get_ob_priors

        ob = get_ob_priors(cfg.train_data_dir, cfg.train_dataset, "train",
                           shape_r_out, shape_c_out, 20, cfg.priors_cache_dir)
    import jax.numpy as jnp

    exported, meta = export_serving(
        model, variables,
        iosize=cfg.iosize, batch_size=cfg.test_batch_size,
        time_dims=cfg.time_dims, videos_per_batch=cfg.videos_per_batch,
        bias_type=cfg.bias_type, gauss=gauss, ob=ob,
        compute_dtype=jnp.bfloat16 if cfg.serve_bf16 else None,
        platforms=cfg.export_platforms.split(",") if cfg.export_platforms else None,
    )
    save_exported(dst, exported, meta)
    log.info("exported %s -> %s (platforms=%s, %s, S=%d, V=%d, %.1f MB)",
             src, dst, meta["platforms"], meta["compute_dtype"],
             meta["x_shape"][1], meta["videos_per_batch"],
             os.path.getsize(dst) / 1e6)


def cmd_test_aot(cfg: Config, artifact: str) -> None:
    """Serve an AOT artifact over the test videos (resumable .mat output,
    same flow as `test` — reference: Demo_Test.py:30-95)."""
    if not os.path.exists(artifact):
        raise SystemExit(f"artifact not found: {artifact}")
    from .runners.export import run_exported

    run_exported(
        cfg.test_input_path, cfg.test_output_path, artifact,
        method_name=cfg.method_name,
    )


def cmd_modelsize(cfg: Config):
    import jax
    import jax.numpy as jnp

    from .models import UAVSal, init_variables
    from .ops.stats import model_size_report

    h, w = cfg.iosize[0], cfg.iosize[1]
    model = UAVSal(
        cnn_type=cfg.cnn_type,
        time_dims=cfg.time_dims,
        num_stblock=cfg.num_stblock,
        bias_type=cfg.bias_type,
    )
    x = jnp.zeros((1, cfg.time_dims, h, w, 3))
    g = jnp.zeros((h // 8, w // 8, 8))
    o = jnp.zeros((h // 8, w // 8, 20))
    s = model.init_state(h, w, 1)
    variables = init_variables(model, jax.random.PRNGKey(0), x, g, o, s)
    print(model_size_report(variables))


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    positionals: List[str] = []
    n_pos = {"convert": 2, "export": 2, "test-aot": 1}.get(cmd)
    if n_pos:
        # these commands take positionals (src/dst paths); every flag in
        # this CLI is --key value, so split positionals out first
        flags: List[str] = []
        i = 0
        while i < len(rest):
            if rest[i].startswith("--"):
                flags += rest[i : i + 2]
                i += 2
            else:
                positionals.append(rest[i])
                i += 1
        if len(positionals) != n_pos:
            usage = {
                "convert": "convert <reference.pth> <out.ckpt> "
                           "[--model_name NAME] [--num_stblock N] "
                           "[--bias_type 1,1,1] [--st_type st]",
                "export": "export <in.ckpt> <out.aot> [--export_platforms tpu] "
                          "[--test_batch_size N] [--videos_per_batch V] "
                          "[--serve_bf16 true] [--fold_bn true]",
                "test-aot": "test-aot <in.aot> [--method_name NAME]",
            }[cmd]
            raise SystemExit(f"usage: {usage}")
        rest = flags
    # Persistent XLA compile cache (seeded from a committed serving_cache/
    # when running from a checkout): every subcommand jits the model, and
    # without this a fresh host pays the full ~6 min XLA compile before
    # frame 1 (utils/compile_cache.py). Set up BEFORE config parsing so any
    # future config path that jits is covered too.
    from .utils.compile_cache import setup_compile_cache

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Use the package parent only when it is a repo CHECKOUT (it carries the
    # committed serving_cache/ seed or a .git marker) — for an installed
    # package (even a writable site-packages) there is no seed there and a
    # .jax_cache would just pollute the install; use the user cache dir.
    is_checkout = os.path.isdir(os.path.join(root, "serving_cache")) or os.path.isdir(
        os.path.join(root, ".git")
    )
    if not is_checkout or not os.access(root, os.W_OK):
        root = os.path.join(os.path.expanduser("~"), ".cache", "uavsal_tpu")
        os.makedirs(root, exist_ok=True)
    setup_compile_cache(root)

    cfg_path, methods, vis_opts, rest = _split_cli(rest, cmd)
    cfg = load_config(cfg_path, rest)

    if cmd == "train":
        cmd_train(cfg)
    elif cmd == "train-img":
        cmd_train_img(cfg)
    elif cmd == "test":
        cmd_test(cfg)
    elif cmd == "eval":
        cmd_eval(cfg, methods)
    elif cmd == "eval-img":
        cmd_eval_img(cfg, methods)
    elif cmd == "vis":
        cmd_vis(cfg, methods, frames=vis_opts["frames"],
                with_fix=vis_opts["with_fix"])
    elif cmd == "convert":
        cmd_convert(cfg, positionals[0], positionals[1])
    elif cmd == "export":
        cmd_export(cfg, positionals[0], positionals[1])
    elif cmd == "test-aot":
        cmd_test_aot(cfg, positionals[0])
    elif cmd == "modelsize":
        cmd_modelsize(cfg)
    elif cmd == "pipeline":  # reference: Demo_Train_Test.py:283-303
        import dataclasses

        cmd_train(cfg)
        # downstream stages must use the just-trained final checkpoint, not
        # the warm-start weights pre_model_path pointed at
        cfg = dataclasses.replace(cfg, pre_model_path="")
        cmd_test(cfg)
        cmd_eval(cfg, methods)
        cmd_vis(cfg, methods, frames=vis_opts["frames"],
                with_fix=vis_opts["with_fix"])
    else:
        print(f"unknown command: {cmd}\n{__doc__}")
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
