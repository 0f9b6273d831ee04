"""Converter round-trip: our variables -> reference-named torch layout -> back."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iip_uavsal_saliency_tpu.models.convert import (
    convert_mobilenet_v2_backbone,
    convert_uavsal_state_dict,
    export_uavsal_state_dict,
)

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier


def _tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_tree_paths(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def test_uavsal_convert_roundtrip(uavsal_small):
    _, variables, _ = uavsal_small
    sd = export_uavsal_state_dict(variables)
    # every tensor present with torch layout
    assert "sfnet.features.features.0.0.weight" in sd
    assert sd["sfnet.features.features.0.0.weight"].shape == (32, 3, 3, 3)
    assert sd["rnn.cell_list.0.rnn_conv.weight"].shape == (256, 512, 3, 3)

    back = convert_uavsal_state_dict(sd)
    got = _tree_paths({"params": back["params"], "batch_stats": back["batch_stats"]})
    want = _tree_paths({"params": variables["params"], "batch_stats": variables["batch_stats"]})
    assert set(got) == set(want), (
        f"missing: {sorted(set(want) - set(got))[:5]} extra: {sorted(set(got) - set(want))[:5]}"
    )
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_converted_variables_run_forward(uavsal_small):
    model, variables, (x, g, o, s) = uavsal_small
    sd = export_uavsal_state_dict(variables)
    back = convert_uavsal_state_dict(sd)
    back = jax.tree_util.tree_map(jnp.asarray, back)
    y, _ = model.apply(back, x, g, o, s)
    y0, _ = model.apply(variables, x, g, o, s)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y0), rtol=1e-6)


def test_cli_convert_end_to_end(uavsal_small, tmp_path):
    """`convert ref.pth out.ckpt` CLI: a torch-saved reference-layout
    state_dict converts to a checkpoint that load_model_for_inference
    restores bit-identically (reference user flow: README.md:42-44 download
    UAVSal_*.pth -> Demo_Test.py:33-39 torch.load().state_dict())."""
    torch = pytest.importorskip("torch")

    from iip_uavsal_saliency_tpu.cli import main
    from iip_uavsal_saliency_tpu.training.checkpoint import load_checkpoint

    _, variables, _ = uavsal_small
    sd = export_uavsal_state_dict(variables)
    src = str(tmp_path / "UAVSal_ref.pth")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, src)
    dst = str(tmp_path / "uavsal.ckpt")

    assert main(["convert", src, dst, "--model_name", "uavsal"]) == 0

    ckpt = load_checkpoint(dst)
    got = _tree_paths({"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]})
    want = _tree_paths(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_backbone_converter_shapes(uavsal_small):
    """A synthetic torchvision-style mobilenet_v2 state_dict converts into the
    expected stage tree (features.0 stem + 17 inverted residuals)."""
    _, variables, _ = uavsal_small
    sd = export_uavsal_state_dict(variables)
    tv_sd = {k[len("sfnet.features.") :]: v for k, v in sd.items() if k.startswith("sfnet.features.")}
    params, stats = convert_mobilenet_v2_backbone(tv_sd)
    assert set(params) == {f"features_{i}" for i in range(18)}
    assert params["features_17"]["project"]["kernel"].shape == (1, 1, 960, 320)


def _inv(k):
    return np.asarray(k).transpose(3, 2, 0, 1)


def _put_conv_bn(out, p, s, ck, bk):
    out[ck + ".weight"] = _inv(p["conv"]["kernel"])
    out[bk + ".weight"] = np.asarray(p["bn"]["scale"])
    out[bk + ".bias"] = np.asarray(p["bn"]["bias"])
    out[bk + ".running_mean"] = np.asarray(s["bn"]["mean"])
    out[bk + ".running_var"] = np.asarray(s["bn"]["var"])


def test_resnet_converter_roundtrip():
    from iip_uavsal_saliency_tpu.models import init_variables
    from iip_uavsal_saliency_tpu.models.backbone import ResNetPyramid
    from iip_uavsal_saliency_tpu.models.convert import convert_resnet_backbone

    for name_id in ("resnet18", "resnet50"):
        model = ResNetPyramid(name_id=name_id)
        x = jnp.zeros((1, 64, 64, 3))
        v = init_variables(model, jax.random.PRNGKey(0), x)
        sd = {}
        _put_conv_bn(sd, v["params"]["stem"], v["batch_stats"]["stem"], "conv1", "bn1")
        for key, bp in v["params"].items():
            if key == "stem":
                continue
            layer, b = key[len("layer")], key.split("_")[1]
            base = f"layer{layer}.{b}"
            for sub, sp in bp.items():
                ss = v["batch_stats"][key][sub]
                if sub == "downsample":
                    _put_conv_bn(sd, sp, ss, f"{base}.downsample.0", f"{base}.downsample.1")
                else:
                    _put_conv_bn(sd, sp, ss, f"{base}.{sub}", f"{base}.bn{sub[-1]}")
        params, stats = convert_resnet_backbone(sd, name_id)
        got = _tree_paths({"p": params, "s": stats})
        want = _tree_paths({"p": v["params"], "s": v["batch_stats"]})
        assert set(got) == set(want), name_id
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=f"{name_id}:{k}")


def test_vgg16_converter_roundtrip():
    from iip_uavsal_saliency_tpu.models import init_variables
    from iip_uavsal_saliency_tpu.models.backbone import VGGPyramid
    from iip_uavsal_saliency_tpu.models.convert import (
        _VGG16_TORCH_IDX,
        convert_vgg16_backbone,
    )

    model = VGGPyramid()
    x = jnp.zeros((1, 64, 64, 3))
    v = init_variables(model, jax.random.PRNGKey(0), x)
    sd = {}
    for s_idx, stage in enumerate(_VGG16_TORCH_IDX, start=1):
        for b_idx, t_idx in enumerate(stage, start=1):
            p = v["params"][f"conv{s_idx}_{b_idx}"]
            sd[f"features.{t_idx}.weight"] = _inv(p["kernel"])
            sd[f"features.{t_idx}.bias"] = np.asarray(p["bias"])
    params = convert_vgg16_backbone(sd)
    got = _tree_paths(params)
    want = _tree_paths(v["params"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
