"""Weight converters: reference PyTorch checkpoints -> our flax variables.

The reference loads pickled full-model .pth files with `strict=False`
(reference: model.py:337-339, Demo_Test.py:33-39) and pretrained torchvision
MobileNetV2 backbones (reference: model_feature.py:59). This module maps
those state_dicts onto our parameter pytree so that:
- ImageNet-pretrained backbones can seed training, and
- reference-trained UAVSal checkpoints can be run for output parity tests.

Layout transforms: torch conv OIHW (O, I/g, kh, kw) -> flax HWIO
(kh, kw, I/g, O) via transpose(2, 3, 1, 0); BN weight/bias ->
scale/bias params, running_mean/var -> batch_stats.

Name map (reference module -> our flax path), derived from
model.py/model_feature.py/model_convlstm.py structure:

  sfnet.features.features.{i}     -> trunk/sfnet/features/features_{i}
  sfnet.{conv_lv3,...,conv_last}  -> trunk/sfnet/<same>
  st_layer.{i}.*                  -> trunk/st_layer_{i}/*
  fust_layer.0                    -> trunk/fust_layer
  {gauss_cb,ob_cb}_layer.{j}      -> mp/{gauss_cb,ob_cb}_layer_{j}
  cxt_cb_prior.{j}                -> mp/cxt_cb_prior_{j}
  {fucb,fucbst}_layer.0           -> mp/{fucb,fucbst}_layer
  rnn.cell_list.0.rnn_conv        -> rnn (single fused HWIO kernel)
  conv_out_st                     -> conv_out_st
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Params = Dict[str, Any]
Stats = Dict[str, Any]


def _t(w) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    w = np.asarray(w)
    return w.transpose(2, 3, 1, 0)


def _get(sd: Mapping[str, Any], key: str) -> np.ndarray:
    return np.asarray(sd[key])


def _conv_bn(sd, conv_key, bn_key) -> Tuple[Params, Stats]:
    """BasicConv2d (Conv + BN): returns ({'conv': ..., 'bn': ...}, stats)."""
    params = {
        "conv": {"kernel": _t(_get(sd, conv_key + ".weight"))},
        "bn": {
            "scale": _get(sd, bn_key + ".weight"),
            "bias": _get(sd, bn_key + ".bias"),
        },
    }
    stats = {
        "bn": {
            "mean": _get(sd, bn_key + ".running_mean"),
            "var": _get(sd, bn_key + ".running_var"),
        }
    }
    return params, stats


def _dwblock(sd, prefix, expand: bool = True) -> Tuple[Params, Stats]:
    """dwBlock: [expand] -> dw -> project(+bn). Torch layer indices within
    `<prefix>.conv`: with expand: 0.0/0.1 (pw), 1.0/1.1 (dw), 2 (pw-linear),
    3 (bn); without expand (ratio 1): 0.0/0.1 (dw), 1 (pw-linear), 2 (bn)."""
    p: Params = {}
    s: Stats = {}
    if expand:
        pe, se = _conv_bn(sd, f"{prefix}.conv.0.0", f"{prefix}.conv.0.1")
        p["expand"], s["expand"] = pe, se
        dw_c, dw_b, proj, proj_bn = (
            f"{prefix}.conv.1.0", f"{prefix}.conv.1.1", f"{prefix}.conv.2", f"{prefix}.conv.3",
        )
    else:
        dw_c, dw_b, proj, proj_bn = (
            f"{prefix}.conv.0.0", f"{prefix}.conv.0.1", f"{prefix}.conv.1", f"{prefix}.conv.2",
        )
    pd, sd_ = _conv_bn(sd, dw_c, dw_b)
    p["dw"], s["dw"] = pd, sd_
    p["project"] = {"kernel": _t(_get(sd, proj + ".weight"))}
    p["project_bn"] = {
        "scale": _get(sd, proj_bn + ".weight"),
        "bias": _get(sd, proj_bn + ".bias"),
    }
    s["project_bn"] = {
        "mean": _get(sd, proj_bn + ".running_mean"),
        "var": _get(sd, proj_bn + ".running_var"),
    }
    return p, s


def _basic(sd, prefix) -> Tuple[Params, Stats]:
    """BasicConv2d stored as Sequential(conv, bn, relu): keys `<p>.0`, `<p>.1`."""
    return _conv_bn(sd, f"{prefix}.0", f"{prefix}.1")


def convert_mobilenet_v2_backbone(sd: Mapping[str, Any], prefix: str = "") -> Tuple[Params, Stats]:
    """torchvision mobilenet_v2 `features.*` -> our features_{i} tree.
    `prefix` is prepended to torch keys (e.g. 'sfnet.features.' for a full
    reference checkpoint, '' for a raw torchvision state_dict)."""
    params: Params = {}
    stats: Stats = {}
    # features.0: ConvBNReLU(Sequential conv, bn, relu6)
    p, s = _conv_bn(sd, f"{prefix}features.0.0", f"{prefix}features.0.1")
    params["features_0"], stats["features_0"] = p, s
    for i in range(1, 18):
        expand = i != 1  # features.1 has expand_ratio 1
        p, s = _dwblock(sd, f"{prefix}features.{i}", expand=expand)
        params[f"features_{i}"], stats[f"features_{i}"] = p, s
    return params, stats


_RESNET_LAYER_COUNTS = {
    "resnet18": [2, 2, 2, 2],
    "resnet34": [3, 4, 6, 3],
    "resnet50": [3, 4, 6, 3],
    "resnet101": [3, 4, 23, 3],
    "resnet152": [3, 8, 36, 3],
}
_RESNET_BOTTLENECK = ("resnet50", "resnet101", "resnet152")


def convert_resnet_backbone(sd: Mapping[str, Any], name_id: str = "resnet50",
                            prefix: str = "") -> Tuple[Params, Stats]:
    """torchvision resnet state_dict -> our ResNetPyramid tree
    (backbone.py: stem + layer{L}_{b}/{conv1..3,downsample}); reference
    wrapper at model_feature.py:72-103."""
    params: Params = {}
    stats: Stats = {}
    p, s = _conv_bn(sd, f"{prefix}conv1", f"{prefix}bn1")
    params["stem"], stats["stem"] = p, s
    n_convs = 3 if name_id in _RESNET_BOTTLENECK else 2
    for li, n_blocks in enumerate(_RESNET_LAYER_COUNTS[name_id], start=1):
        for b in range(n_blocks):
            bp: Params = {}
            bs: Stats = {}
            base = f"{prefix}layer{li}.{b}"
            for k in range(1, n_convs + 1):
                p, s = _conv_bn(sd, f"{base}.conv{k}", f"{base}.bn{k}")
                bp[f"conv{k}"], bs[f"conv{k}"] = p, s
            if f"{base}.downsample.0.weight" in sd:
                p, s = _conv_bn(sd, f"{base}.downsample.0", f"{base}.downsample.1")
                bp["downsample"], bs["downsample"] = p, s
            params[f"layer{li}_{b}"], stats[f"layer{li}_{b}"] = bp, bs
    return params, stats


# torchvision vgg16 `features` conv indices per stage (maxpools between)
_VGG16_TORCH_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]


def convert_vgg16_backbone(sd: Mapping[str, Any], prefix: str = "") -> Params:
    """torchvision vgg16 (no BN) -> our VGGPyramid conv{s}_{b} tree
    (reference wrapper: model_feature.py:106-128). VGG convs carry biases and
    no BN, so there are no batch_stats."""
    params: Params = {}
    for s_idx, stage in enumerate(_VGG16_TORCH_IDX, start=1):
        for b_idx, t_idx in enumerate(stage, start=1):
            params[f"conv{s_idx}_{b_idx}"] = {
                "kernel": _t(_get(sd, f"{prefix}features.{t_idx}.weight")),
                "bias": _get(sd, f"{prefix}features.{t_idx}.bias"),
            }
    return params


def _t3(w) -> np.ndarray:
    """torch conv3d OIDHW -> flax DHWIO."""
    w = np.asarray(w)
    return w.transpose(2, 3, 4, 1, 0)


def _basic3d(sd, prefix) -> Tuple[Params, Stats]:
    """BasicConv3d stored as Sequential(conv3d, bn3d, relu6): keys `<p>.0/.1`
    (reference: model.py:383-390)."""
    params = {
        "conv": {"kernel": _t3(_get(sd, prefix + ".0.weight"))},
        "bn": {
            "scale": _get(sd, prefix + ".1.weight"),
            "bias": _get(sd, prefix + ".1.bias"),
        },
    }
    stats = {
        "bn": {
            "mean": _get(sd, prefix + ".1.running_mean"),
            "var": _get(sd, prefix + ".1.running_var"),
        }
    }
    return params, stats


def _convert_sfnet(sd: Mapping[str, Any], prefix: str = "sfnet.") -> Tuple[Params, Stats]:
    """SRF-Net subtree: backbone pyramid + laterals + ASPP
    (reference: model.py:106-160 `uavsal_srfnet_aspp`)."""
    params: Params = {}
    stats: Stats = {}
    bp, bs = convert_mobilenet_v2_backbone(sd, prefix=f"{prefix}features.")
    params["features"], stats["features"] = bp, bs
    for name in ("conv_lv3", "conv_lv4", "lv5_aspp1", "conv_lv5", "conv_last"):
        p, s = _basic(sd, f"{prefix}{name}")
        params[name], stats[name] = p, s
    for name in ("lv5_aspp2", "lv5_aspp3", "lv5_aspp4"):
        p, s = _dwblock(sd, f"{prefix}{name}")
        params[name], stats[name] = p, s
    return params, stats


def _convert_teconv(sd, prefix) -> Tuple[Params, Stats]:
    """teConv_sub: reduce 1x1 -> diff dwBlock -> expand 1x1
    (reference: model.py:173-208)."""
    p: Params = {}
    s: Stats = {}
    pp, ss = _basic(sd, f"{prefix}.reduce_conv")
    p["reduce_conv"], s["reduce_conv"] = pp, ss
    pp, ss = _dwblock(sd, f"{prefix}.sub_conv")
    p["sub_conv"], s["sub_conv"] = pp, ss
    pp, ss = _basic(sd, f"{prefix}.last_conv")
    p["last_conv"], s["last_conv"] = pp, ss
    return p, s


def _convert_stblock(sd, prefix, kind: str = "st") -> Tuple[Params, Stats]:
    """One ST block of any ordering/3D kind. The reference's orderings share
    submodule names (stconv_sp/stconv_te/stconv_last, model.py:210-249 and
    :392-478); the 3D kinds use BasicConv3d (:480-556)."""
    blk_p: Params = {}
    blk_s: Stats = {}
    if kind in ("st", "s2t", "t2s", "s_s2t"):
        p, s = _dwblock(sd, f"{prefix}.stconv_sp.spconv")
        blk_p["stconv_sp"] = {"spconv": p}
        blk_s["stconv_sp"] = {"spconv": s}
        p, s = _convert_teconv(sd, f"{prefix}.stconv_te")
        blk_p["stconv_te"], blk_s["stconv_te"] = p, s
        p, s = _basic(sd, f"{prefix}.stconv_last")
        blk_p["stconv_last"], blk_s["stconv_last"] = p, s
    elif kind == "stc3d":
        p, s = _basic3d(sd, f"{prefix}.stconv_te")
        blk_p["stconv_te"], blk_s["stconv_te"] = p, s
    elif kind == "stc2_3d":
        p, s = _basic(sd, f"{prefix}.stconv_sp")
        blk_p["stconv_sp"], blk_s["stconv_sp"] = p, s
        p, s = _basic3d(sd, f"{prefix}.stconv_te")
        blk_p["stconv_te"], blk_s["stconv_te"] = p, s
        p, s = _basic(sd, f"{prefix}.stconv_last")
        blk_p["stconv_last"], blk_s["stconv_last"] = p, s
    else:
        raise ValueError(kind)
    return blk_p, blk_s


def _convert_trunk(sd, num_stblock: int, st_kind: str = "st") -> Tuple[Params, Stats]:
    """The shared trunk tree: sfnet + st_layer_{i} + fust_layer."""
    params: Params = {}
    stats: Stats = {}
    params["sfnet"], stats["sfnet"] = _convert_sfnet(sd)
    for i in range(num_stblock):
        p, s = _convert_stblock(sd, f"st_layer.{i}", st_kind)
        params[f"st_layer_{i}"], stats[f"st_layer_{i}"] = p, s
    p, s = _dwblock(sd, "fust_layer.0")
    params["fust_layer"], stats["fust_layer"] = p, s
    return params, stats


def _convert_mp(sd, bias_type) -> Tuple[Params, Stats]:
    """MP-Net prior streams + fusion (reference: model.py:281-324)."""
    params: Params = {}
    stats: Stats = {}
    use_gauss, use_ob, use_cxt = [bool(b) for b in bias_type]
    if use_gauss:
        for j in range(2):
            p, s = _dwblock(sd, f"gauss_cb_layer.{j}")
            params[f"gauss_cb_layer_{j}"], stats[f"gauss_cb_layer_{j}"] = p, s
    if use_ob:
        for j in range(2):
            p, s = _dwblock(sd, f"ob_cb_layer.{j}")
            params[f"ob_cb_layer_{j}"], stats[f"ob_cb_layer_{j}"] = p, s
    if use_cxt:
        for j in range(2):
            p, s = _dwblock(sd, f"cxt_cb_prior.{j}")
            params[f"cxt_cb_prior_{j}"], stats[f"cxt_cb_prior_{j}"] = p, s
    if use_gauss or use_ob or use_cxt:
        p, s = _dwblock(sd, "fucb_layer.0")
        params["fucb_layer"], stats["fucb_layer"] = p, s
        p, s = _dwblock(sd, "fucbst_layer.0")
        params["fucbst_layer"], stats["fucbst_layer"] = p, s
    return params, stats


def convert_uavsal_state_dict(
    sd: Mapping[str, Any],
    num_stblock: int = 2,
    bias_type=(1, 1, 1),
) -> Dict[str, Any]:
    """Full reference UAVSal state_dict -> {'params': ..., 'batch_stats': ...}."""
    params: Params = {}
    stats: Stats = {}
    params["trunk"], stats["trunk"] = _convert_trunk(sd, num_stblock)
    params["mp"], stats["mp"] = _convert_mp(sd, bias_type)

    # TWA recurrence: single conv over concat([x, h])
    params["rnn"] = {"kernel": _t(_get(sd, "rnn.cell_list.0.rnn_conv.weight"))}

    p, s = _dwblock(sd, "conv_out_st")
    params["conv_out_st"], stats["conv_out_st"] = p, s

    return {"params": params, "batch_stats": stats}


def convert_zoo_state_dict(
    model_name: str,
    sd: Mapping[str, Any],
    num_stblock: int = 2,
    bias_type=(1, 1, 1),
    st_type: str = "st",
) -> Dict[str, Any]:
    """Reference ablation-zoo state_dict -> our variables, for every
    MODEL_ZOO name (reference classes: model.py:582-1076).

    Tree layouts:
    - uavsal_spconv / uavsal_teconv: flat sfnet/st_layer_{i}/fust_layer
      (reference: model.py:582-662 — st_layer.{i} is the block itself);
    - uavsal_stblocks[_type] / stc3d / stc2_3d: trunk/... + conv_out_st;
    - uavsal_mp adds mp/...; uavsal_lstm adds mp/... + rnn (gate conv at
      rnn.cell_list.0.rnn_conv, order i,f,o,g — model_convlstm.py:103-121).
    """
    name = model_name.lower()
    params: Params = {}
    stats: Stats = {}

    if name == "uavsal":
        return convert_uavsal_state_dict(sd, num_stblock, bias_type)

    if name in ("uavsal_spconv", "uavsal_teconv"):
        params["sfnet"], stats["sfnet"] = _convert_sfnet(sd)
        for i in range(num_stblock):
            if name == "uavsal_spconv":
                p, s = _dwblock(sd, f"st_layer.{i}")
            else:
                p, s = _convert_teconv(sd, f"st_layer.{i}")
            params[f"st_layer_{i}"], stats[f"st_layer_{i}"] = p, s
        p, s = _dwblock(sd, "fust_layer.0")
        params["fust_layer"], stats["fust_layer"] = p, s
    else:
        st_kind = {
            "uavsal_stblocks": "st",
            "uavsal_stblocks_type": st_type,
            "uavsal_stc3d": "stc3d",
            "uavsal_stc2_3d": "stc2_3d",
            "uavsal_mp": "st",
            "uavsal_lstm": "st",
        }[name]
        params["trunk"], stats["trunk"] = _convert_trunk(sd, num_stblock, st_kind)
        if name in ("uavsal_mp", "uavsal_lstm"):
            params["mp"], stats["mp"] = _convert_mp(sd, bias_type)
        if name == "uavsal_lstm":
            params["rnn"] = {
                "kernel": _t(_get(sd, "rnn.cell_list.0.rnn_conv.weight"))
            }

    p, s = _dwblock(sd, "conv_out_st")
    params["conv_out_st"], stats["conv_out_st"] = p, s
    return {"params": params, "batch_stats": stats}


def _inv_t(w) -> np.ndarray:
    """flax HWIO -> torch OIHW."""
    return np.asarray(w).transpose(3, 2, 0, 1)


def _export_conv_bn(p: Params, s: Stats, conv_key: str, bn_key: str, out: Dict[str, np.ndarray]):
    out[conv_key + ".weight"] = _inv_t(p["conv"]["kernel"])
    out[bn_key + ".weight"] = np.asarray(p["bn"]["scale"])
    out[bn_key + ".bias"] = np.asarray(p["bn"]["bias"])
    out[bn_key + ".running_mean"] = np.asarray(s["bn"]["mean"])
    out[bn_key + ".running_var"] = np.asarray(s["bn"]["var"])


def _export_dwblock(p: Params, s: Stats, prefix: str, out: Dict[str, np.ndarray]):
    expand = "expand" in p
    if expand:
        _export_conv_bn(p["expand"], s["expand"], f"{prefix}.conv.0.0", f"{prefix}.conv.0.1", out)
        dw_c, dw_b, proj, proj_bn = (
            f"{prefix}.conv.1.0", f"{prefix}.conv.1.1", f"{prefix}.conv.2", f"{prefix}.conv.3",
        )
    else:
        dw_c, dw_b, proj, proj_bn = (
            f"{prefix}.conv.0.0", f"{prefix}.conv.0.1", f"{prefix}.conv.1", f"{prefix}.conv.2",
        )
    _export_conv_bn(p["dw"], s["dw"], dw_c, dw_b, out)
    out[proj + ".weight"] = _inv_t(p["project"]["kernel"])
    out[proj_bn + ".weight"] = np.asarray(p["project_bn"]["scale"])
    out[proj_bn + ".bias"] = np.asarray(p["project_bn"]["bias"])
    out[proj_bn + ".running_mean"] = np.asarray(s["project_bn"]["mean"])
    out[proj_bn + ".running_var"] = np.asarray(s["project_bn"]["var"])


def export_uavsal_state_dict(variables: Mapping[str, Any], num_stblock: int = 2,
                             bias_type=(1, 1, 1)) -> Dict[str, np.ndarray]:
    """Inverse of convert_uavsal_state_dict: our variables -> reference-named
    torch-layout tensors (for interop with the reference tooling, and the
    round-trip test of the name map)."""
    p, s = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}

    sf_p, sf_s = p["trunk"]["sfnet"], s["trunk"]["sfnet"]
    _export_conv_bn(
        sf_p["features"]["features_0"], sf_s["features"]["features_0"],
        "sfnet.features.features.0.0", "sfnet.features.features.0.1", out,
    )
    for i in range(1, 18):
        _export_dwblock(
            sf_p["features"][f"features_{i}"], sf_s["features"][f"features_{i}"],
            f"sfnet.features.features.{i}", out,
        )
    for name in ("conv_lv3", "conv_lv4", "lv5_aspp1", "conv_lv5", "conv_last"):
        _export_conv_bn(sf_p[name], sf_s[name], f"sfnet.{name}.0", f"sfnet.{name}.1", out)
    for name in ("lv5_aspp2", "lv5_aspp3", "lv5_aspp4"):
        _export_dwblock(sf_p[name], sf_s[name], f"sfnet.{name}", out)

    for i in range(num_stblock):
        bp, bs = p["trunk"][f"st_layer_{i}"], s["trunk"][f"st_layer_{i}"]
        _export_dwblock(bp["stconv_sp"]["spconv"], bs["stconv_sp"]["spconv"],
                        f"st_layer.{i}.stconv_sp.spconv", out)
        _export_conv_bn(bp["stconv_te"]["reduce_conv"], bs["stconv_te"]["reduce_conv"],
                        f"st_layer.{i}.stconv_te.reduce_conv.0",
                        f"st_layer.{i}.stconv_te.reduce_conv.1", out)
        _export_dwblock(bp["stconv_te"]["sub_conv"], bs["stconv_te"]["sub_conv"],
                        f"st_layer.{i}.stconv_te.sub_conv", out)
        _export_conv_bn(bp["stconv_te"]["last_conv"], bs["stconv_te"]["last_conv"],
                        f"st_layer.{i}.stconv_te.last_conv.0",
                        f"st_layer.{i}.stconv_te.last_conv.1", out)
        _export_conv_bn(bp["stconv_last"], bs["stconv_last"],
                        f"st_layer.{i}.stconv_last.0", f"st_layer.{i}.stconv_last.1", out)

    _export_dwblock(p["trunk"]["fust_layer"], s["trunk"]["fust_layer"], "fust_layer.0", out)

    use_gauss, use_ob, use_cxt = [bool(b) for b in bias_type]
    if use_gauss:
        for j in range(2):
            _export_dwblock(p["mp"][f"gauss_cb_layer_{j}"], s["mp"][f"gauss_cb_layer_{j}"],
                            f"gauss_cb_layer.{j}", out)
    if use_ob:
        for j in range(2):
            _export_dwblock(p["mp"][f"ob_cb_layer_{j}"], s["mp"][f"ob_cb_layer_{j}"],
                            f"ob_cb_layer.{j}", out)
    if use_cxt:
        for j in range(2):
            _export_dwblock(p["mp"][f"cxt_cb_prior_{j}"], s["mp"][f"cxt_cb_prior_{j}"],
                            f"cxt_cb_prior.{j}", out)
    if use_gauss or use_ob or use_cxt:
        _export_dwblock(p["mp"]["fucb_layer"], s["mp"]["fucb_layer"], "fucb_layer.0", out)
        _export_dwblock(p["mp"]["fucbst_layer"], s["mp"]["fucbst_layer"], "fucbst_layer.0", out)

    out["rnn.cell_list.0.rnn_conv.weight"] = _inv_t(p["rnn"]["kernel"])
    _export_dwblock(p["conv_out_st"], s["conv_out_st"], "conv_out_st", out)
    return out


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a .pth file; accepts either a pickled module or a raw state_dict.
    Runs on CPU torch (the conversion is pure numpy afterwards)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
