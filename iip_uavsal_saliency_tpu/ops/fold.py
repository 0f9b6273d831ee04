"""Serving-time BatchNorm fold: a one-shot params transform.

Eval-mode BatchNorm is a frozen per-channel affine
(reference semantics: model.py:65-72 BasicConv2d eval path), so it folds
into the preceding conv:

    y = (conv(x) - mean) * scale / sqrt(var + eps) + bias
      = conv'(x) + bias',   conv' = conv * s,  bias' = bias - mean * s

`fold_batchnorm(variables)` rewrites the whole variable tree in place of the
user: every Conv+BN pair gets its kernel pre-scaled and its BN reduced to an
EXACT identity-plus-bias (mean=0, var=1, scale=sqrt(1+eps) so the module's
`scale * rsqrt(var + eps)` evaluates to 1 to an ulp; all values survive a
bf16 cast exactly except the sqrt(1+eps) scale, which rounds to 1.0 — the
correct value). The module graph is untouched, so folded variables serve
through the same compiled program, checkpoints round-trip, and the Pallas
dwBlock path (which re-folds via fold_conv_bn) is idempotent over it.

What it buys on TPU: the conv kernels absorb the BN scale at LOAD time, so
the serving graph's BN math degenerates to constants XLA's algebraic
simplifier + fusion handle; measured effect is documented in docs/PERF.md
(XLA already fuses eval-BN affines into conv epilogues, so this is a
numerical simplification more than a speedup — the honest number lives
there). It also makes exported weights self-contained: a folded checkpoint
scores identically with all-default BN stats.

Patterns folded (see ops/layers.py):
- ConvBNAct / ConvBNAct3D:  {conv: {kernel}, bn: {scale, bias}}
  + stats {bn: {mean, var}}         (any conv rank; scale on last axis)
- DWBlock projection:       {project: {kernel}, project_bn: {scale, bias}}
  + stats {project_bn: {mean, var}}
Everything else (VGG biased convs, the TWA gate conv, priors) passes
through unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .layers import BN_EPS


def _fold_pair(kernel, bn_p: Dict[str, Any], bn_s: Dict[str, Any], eps: float):
    """(kernel', identity bn params, identity bn stats)."""
    kernel = np.asarray(kernel, np.float32)
    scale = np.asarray(bn_p["scale"], np.float32)
    bias = np.asarray(bn_p["bias"], np.float32)
    mean = np.asarray(bn_s["mean"], np.float32)
    var = np.asarray(bn_s["var"], np.float32)
    s = scale / np.sqrt(var + eps)
    kernel2 = kernel * s  # broadcast over the output-channel (last) axis
    bias2 = bias - mean * s
    c = bias2.shape[0]
    # identity BN: y = (x - 0) * sqrt(1+eps)/sqrt(1+eps) + bias2 == x + bias2.
    # var=1 (not 1-eps) so a bf16 cast of the stats keeps the identity exact.
    ident_p = {
        "scale": np.full((c,), np.sqrt(np.float32(1.0) + np.float32(eps)), np.float32),
        "bias": bias2.astype(np.float32),
    }
    ident_s = {
        "mean": np.zeros((c,), np.float32),
        "var": np.ones((c,), np.float32),
    }
    return kernel2.astype(np.float32), ident_p, ident_s


def _is_conv_bn(p_node, s_node) -> bool:
    return (
        isinstance(p_node, dict)
        and isinstance(p_node.get("conv"), dict)
        and "kernel" in p_node["conv"]
        and "bias" not in p_node["conv"]
        and isinstance(p_node.get("bn"), dict)
        and isinstance(s_node, dict)
        and isinstance(s_node.get("bn"), dict)
    )


def _is_project_bn(p_node, s_node) -> bool:
    return (
        isinstance(p_node, dict)
        and isinstance(p_node.get("project"), dict)
        and "kernel" in p_node["project"]
        and isinstance(p_node.get("project_bn"), dict)
        and isinstance(s_node, dict)
        and isinstance(s_node.get("project_bn"), dict)
    )


def _walk(p_node, s_node, eps: float) -> Tuple[Any, Any]:
    if not isinstance(p_node, dict):
        return p_node, s_node
    p_out: Dict[str, Any] = dict(p_node)
    s_out: Dict[str, Any] = dict(s_node) if isinstance(s_node, dict) else {}
    handled = set()

    if _is_conv_bn(p_node, s_node):
        k2, bn_p, bn_s = _fold_pair(
            p_node["conv"]["kernel"], p_node["bn"], s_node["bn"], eps
        )
        p_out["conv"] = {**p_node["conv"], "kernel": k2}
        p_out["bn"] = bn_p
        s_out["bn"] = bn_s
        handled |= {"conv", "bn"}
    if _is_project_bn(p_node, s_node):
        k2, bn_p, bn_s = _fold_pair(
            p_node["project"]["kernel"], p_node["project_bn"],
            s_node["project_bn"], eps,
        )
        p_out["project"] = {**p_node["project"], "kernel": k2}
        p_out["project_bn"] = bn_p
        s_out["project_bn"] = bn_s
        handled |= {"project", "project_bn"}

    for k, v in p_node.items():
        if k in handled or not isinstance(v, dict):
            continue
        sp, ss = _walk(
            v, s_node.get(k, {}) if isinstance(s_node, dict) else {}, eps
        )
        p_out[k] = sp
        if isinstance(s_node, dict) and k in s_node:
            s_out[k] = ss
    return p_out, s_out


def looks_folded(variables: Dict[str, Any], eps: float = BN_EPS) -> bool:
    """True when `variables` carries fold_batchnorm's signature.

    The fold leaves a distinctive fingerprint no trained (or freshly
    initialized) checkpoint has: some BN whose params scale is the constant
    sqrt(1+eps) on EVERY channel (fresh init uses 1.0) while its running
    stats are exactly mean=0 / var=1. Trainer uses this to reject folded
    variables loudly — fine-tuning them would double-count the absorbed BN
    scale (see fold_batchnorm's docstring)."""
    marker = np.sqrt(np.float32(1.0) + np.float32(eps))

    def _scan(p_node, s_node) -> bool:
        if not isinstance(p_node, dict) or not isinstance(s_node, dict):
            return False
        for name in ("bn", "project_bn"):
            p_bn, s_bn = p_node.get(name), s_node.get(name)
            if (
                isinstance(p_bn, dict) and isinstance(s_bn, dict)
                and "scale" in p_bn and "mean" in s_bn and "var" in s_bn
            ):
                scale = np.asarray(p_bn["scale"], np.float32)
                if (
                    scale.size
                    and np.all(scale == marker)
                    and np.all(np.asarray(s_bn["mean"], np.float32) == 0)
                    and np.all(np.asarray(s_bn["var"], np.float32) == 1)
                ):
                    return True
        return any(
            _scan(v, s_node.get(k, {}))
            for k, v in p_node.items()
            if isinstance(v, dict)
        )

    return _scan(variables.get("params", {}), variables.get("batch_stats", {}))


def fold_batchnorm(variables: Dict[str, Any], eps: float = BN_EPS) -> Dict[str, Any]:
    """Return variables with every eval-mode Conv+BN pair folded.

    Output trees have the SAME structure (checkpoint- and program-
    compatible); only values change. Numerics: folded forward == unfolded
    eval forward to ~1e-5 in f32 (see tests/test_fold.py). Do NOT train on
    folded variables: train-mode BN would re-normalize with the identity
    stats and the absorbed scale would be double-counted.
    """
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    p2, s2 = _walk(params, stats, float(eps))
    out = dict(variables)
    out["params"] = p2
    out["batch_stats"] = s2
    return out
