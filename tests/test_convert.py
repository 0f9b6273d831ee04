"""Converter round-trip: our variables -> reference-named torch layout -> back."""

import numpy as np
import jax
import jax.numpy as jnp

from iip_uavsal_saliency_tpu.models.convert import (
    convert_mobilenet_v2_backbone,
    convert_uavsal_state_dict,
    export_uavsal_state_dict,
)


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


def test_backbone_converter_shapes(uavsal_small):
    """A synthetic torchvision-style mobilenet_v2 state_dict converts into the
    expected stage tree (features.0 stem + 17 inverted residuals)."""
    _, variables, _ = uavsal_small
    sd = export_uavsal_state_dict(variables)
    tv_sd = {k[len("sfnet.features.") :]: v for k, v in sd.items() if k.startswith("sfnet.features.")}
    params, stats = convert_mobilenet_v2_backbone(tv_sd)
    assert set(params) == {f"features_{i}" for i in range(18)}
    assert params["features_17"]["project"]["kernel"].shape == (1, 1, 960, 320)
