"""CLI plumbing: flag parsing, config overrides, command dispatch."""

from iip_uavsal_saliency_tpu.cli import _split_cli, main
from iip_uavsal_saliency_tpu.utils.config import load_config


def test_split_cli():
    cfg_path, methods, vis_opts, rest = _split_cli(
        ["--config", "c.json", "--methods", "A,B", "--epochs", "3",
         "--model-path", "/w/final.ckpt"]
    )
    assert cfg_path == "c.json"
    assert methods == ["A", "B"]
    assert rest == ["--epochs", "3", "--pre_model_path", "/w/final.ckpt"]
    assert vis_opts == {"frames": None, "with_fix": 0}


def test_split_cli_vis_flags():
    """--frames/--with-fix reach cmd_vis (frame exporter + fixation dots)."""
    _, _, vis_opts, rest = _split_cli(
        ["--frames", "0,5,10", "--with-fix", "--epochs", "1"]
    )
    assert vis_opts == {"frames": [0, 5, 10], "with_fix": 1}
    assert rest == ["--epochs", "1"]


def test_split_cli_vis_flags_pipeline_and_rejection():
    """pipeline accepts the vis flags (its last stage is cmd_vis); other
    subcommands reject them outright."""
    import pytest as _pytest

    _, _, vis_opts, rest = _split_cli(["--frames", "2", "--with-fix"], cmd="pipeline")
    assert vis_opts == {"frames": [2], "with_fix": 1} and rest == []
    with _pytest.raises(SystemExit, match="only valid"):
        _split_cli(["--with-fix"], cmd="test")


def test_load_config_overrides():
    cfg = load_config(None, ["--epochs", "3", "--iosize", "288,512,36,64",
                             "--learning_rate", "1e-5", "--is_early_stop", "false"])
    assert cfg.epochs == 3
    assert cfg.iosize == (288, 512, 36, 64)
    assert cfg.learning_rate == 1e-5
    assert cfg.is_early_stop is False


def test_bake_params_flag():
    # baked-constant serving is the single-chip default; --bake_params false
    # restores the argument-passing step (required for multi-chip meshes)
    assert load_config(None, []).bake_params is True
    assert load_config(None, ["--bake_params", "false"]).bake_params is False


def test_main_help_and_unknown():
    assert main([]) == 0
    assert main(["--help"]) == 0
    assert main(["frobnicate"]) == 2


def test_metrics_logger(tmp_path):
    import json

    from iip_uavsal_saliency_tpu.utils.metrics_log import MetricsLogger

    with MetricsLogger(str(tmp_path)) as m:
        m.scalar("train/loss", 1.5, step=0)
        m.scalar("val/mean_loss", 2.0)
        path = m.path
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["tag"] == "train/loss" and lines[0]["step"] == 0
    assert lines[1]["value"] == 2.0 and "step" not in lines[1]


def test_split_cli_missing_value():
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _split_cli(["--model-path"])
    with _pytest.raises(SystemExit):
        _split_cli(["--frames"])


def test_config_resume_and_videos_flags():
    cfg = load_config(None, ["--resume", "true", "--videos_per_step", "2"])
    assert cfg.resume is True and cfg.videos_per_step == 2


def test_config_remat_flag():
    cfg = load_config(None, ["--remat", "true", "--mixed_precision", "1",
                             "--prefetch_decode", "false"])
    assert cfg.remat is True and cfg.mixed_precision is True
    assert cfg.prefetch_decode is False
    base = load_config(None, [])
    assert base.remat is False and base.prefetch_decode is True

    # the flag must reach the Trainer's step-construction config
    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig

    assert TrainConfig(remat=True).remat is True


def test_st_type_plumbs_to_model():
    """--st_type reaches the uavsal_stblocks_type model through the shared
    kwargs filter (round-3 verdict: it silently trained with the default)."""
    from iip_uavsal_saliency_tpu.models import build_adapted_model

    cfg = load_config(None, ["--st_type", "s2t"])
    assert cfg.st_type == "s2t"

    from iip_uavsal_saliency_tpu.training.trainer import TrainConfig

    assert TrainConfig(st_type="t2s").st_type == "t2s"

    adapter = build_adapted_model(
        "uavsal_stblocks_type", filter_kwargs=True, cnn_type="mobilenet_v2",
        time_dims=5, num_stblock=2, st_type="s2t", bias_type=(1, 1, 1),
    )
    assert adapter.model.st_type == "s2t"
    # variants that don't declare a kwarg silently drop it instead of raising
    adapter = build_adapted_model(
        "uavsal_spconv", filter_kwargs=True, cnn_type="mobilenet_v2",
        time_dims=5, num_stblock=2, st_type="s2t", bias_type=(1, 1, 1),
    )
    assert not hasattr(adapter.model, "time_dims")


def test_convert_usage_errors():
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="usage: convert"):
        main(["convert"])
    with _pytest.raises(SystemExit, match="usage: convert"):
        main(["convert", "only_one.pth"])
    with _pytest.raises(SystemExit, match="not found"):
        main(["convert", "/nonexistent/ref.pth", "/tmp/out.ckpt"])


def test_export_and_test_aot_usage_errors():
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="usage: export"):
        main(["export"])
    with _pytest.raises(SystemExit, match="usage: export"):
        main(["export", "only_one.ckpt"])
    with _pytest.raises(SystemExit, match="checkpoint not found"):
        main(["export", "/nonexistent/in.ckpt", "/tmp/out.aot"])
    with _pytest.raises(SystemExit, match="usage: test-aot"):
        main(["test-aot"])
    with _pytest.raises(SystemExit, match="artifact not found"):
        main(["test-aot", "/nonexistent/in.aot"])


def test_load_config_missing_file_errors():
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="config file not found"):
        load_config("/nonexistent/cfg.json", [])


def test_frozen_mask_warns_on_unmatched_prefix(caplog):
    import logging

    import numpy as np

    from iip_uavsal_saliency_tpu.training.optim import make_frozen_mask

    params = {"sfnet": {"w": np.zeros(2)}, "head": {"w": np.zeros(2)}}
    with caplog.at_level(logging.WARNING, logger="uavsal.train"):
        mask = make_frozen_mask(params, ("trunk/sfnet",))
    assert "matches no parameter" in caplog.text
    assert mask == {"sfnet": {"w": True}, "head": {"w": True}}

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="uavsal.train"):
        mask = make_frozen_mask(params, ("sfnet",))
    assert "matches no parameter" not in caplog.text
    assert mask == {"sfnet": {"w": False}, "head": {"w": True}}
