"""Training losses: 10*KLD - 2*CC - NSS composite and variants.

JAX re-statement of the reference loss suite (reference: loss_functions.py).
Layout: predictions (S, H, W, 1), targets (S, H, W, 2) with
channel 0 = blurred fixation map, channel 1 = binary fixation points
(reference: Demo_Train_Test.py:114-115 concat order).

All reductions are per-frame then meaned over the batch, exactly as the
reference (per-sample metric, `torch.mean(..., 0)`). `get_std` uses the
unbiased (N-1) estimator to match `torch.std`.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 2.2204e-16


def _sum_hw(x):
    return jnp.sum(x, axis=(1, 2), keepdims=True)


def _mean_hw(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def _std_hw(x):
    # torch.std default: unbiased (Bessel-corrected)
    n = x.shape[1] * x.shape[2]
    m = _mean_hw(x)
    var = jnp.sum((x - m) ** 2, axis=(1, 2), keepdims=True) / (n - 1)
    return jnp.sqrt(var)


def _max_hw(x):
    return jnp.max(x, axis=(1, 2), keepdims=True)


def _min_hw(x):
    return jnp.min(x, axis=(1, 2), keepdims=True)


def metric_kl(y_pred, y_true):
    """Per-frame KL divergence (reference: loss_functions.py:64-69)."""
    t = y_true[..., 0:1]
    t = t / (_sum_hw(t) + EPS)
    p = y_pred / (_sum_hw(y_pred) + EPS)
    return jnp.sum(t * jnp.log(t / (p + EPS) + EPS), axis=(1, 2))[..., 0]


def metric_cc(y_pred, y_true):
    """Per-frame linear correlation (reference: loss_functions.py:71-80)."""
    t = y_true[..., 0:1]
    t = (t - _mean_hw(t)) / (_std_hw(t) + EPS)
    p = (y_pred - _mean_hw(y_pred)) / (_std_hw(y_pred) + EPS)
    t = t - _mean_hw(t)
    p = p - _mean_hw(p)
    r1 = jnp.sum(t * p, axis=(1, 2))
    r2 = jnp.sqrt(jnp.sum(p * p, axis=(1, 2)) * jnp.sum(t * t, axis=(1, 2)))
    return (r1 / (r2 + EPS))[..., 0]


def metric_nss(y_pred, y_true):
    """Per-frame NSS (reference: loss_functions.py:82-86)."""
    f = y_true[..., 1:2]
    p = (y_pred - _mean_hw(y_pred)) / (_std_hw(y_pred) + EPS)
    return (jnp.sum(f * p, axis=(1, 2)) / (jnp.sum(f, axis=(1, 2)) + EPS))[..., 0]


def metric_sim(y_pred, y_true):
    """Per-frame histogram similarity (reference: loss_functions.py:88-99)."""
    t = y_true[..., 0:1]
    t = (t - _min_hw(t)) / (_max_hw(t) - _min_hw(t) + EPS)
    p = (y_pred - _min_hw(y_pred)) / (_max_hw(y_pred) - _min_hw(y_pred) + EPS)
    t = t / (_sum_hw(t) + EPS)
    p = p / (_sum_hw(p) + EPS)
    return jnp.sum(jnp.minimum(t, p), axis=(1, 2))[..., 0]


def loss_fu(y_pred, y_true):
    """Composite 10*KLD - 2*CC - NSS (reference: loss_functions.py:43-50)."""
    return jnp.mean(
        10.0 * metric_kl(y_pred, y_true)
        - 2.0 * metric_cc(y_pred, y_true)
        - metric_nss(y_pred, y_true)
    )


def loss_fu_dy(y_pred, y_true):
    """Composite loss on 5-D (V, S, H, W, C) clips: flatten the video/frame
    axes then apply loss_fu (reference: loss_functions.py:52-62)."""
    v, s = y_pred.shape[0], y_pred.shape[1]
    return loss_fu(
        y_pred.reshape(v * s, *y_pred.shape[2:]),
        y_true.reshape(v * s, *y_true.shape[2:]),
    )


def loss_kl(y_pred, y_true):
    """10*KLD (reference: loss_functions.py:37-41)."""
    return jnp.mean(10.0 * metric_kl(y_pred, y_true))


def loss_ml(y_pred, y_true):
    """Max-normalized weighted MSE (reference: loss_functions.py:101-105)."""
    t = y_true[..., 0:1]
    p = y_pred / (_max_hw(y_pred) + EPS)
    return jnp.mean((p - t) * (p - t) / (1.0 - t + 0.1))


# --------------------------------------------------------------------------- #
# Per-frame forms: (N, H, W, C) -> (N,). Each satisfies
# loss_x(pred, true) == mean(per_frame_x(pred, true)), so a trainer can
# reweight frames (padding masks) and still reduce to the exact same scalar
# on full clips.

def per_frame_fu(y_pred, y_true):
    return (
        10.0 * metric_kl(y_pred, y_true)
        - 2.0 * metric_cc(y_pred, y_true)
        - metric_nss(y_pred, y_true)
    )


def per_frame_kl(y_pred, y_true):
    return 10.0 * metric_kl(y_pred, y_true)


def per_frame_ml(y_pred, y_true):
    t = y_true[..., 0:1]
    p = y_pred / (_max_hw(y_pred) + EPS)
    return jnp.mean((p - t) * (p - t) / (1.0 - t + 0.1), axis=(1, 2, 3))


# loss_fu_dy is loss_fu after flattening (V,S) — trainers flatten before the
# loss call, so its per-frame form is per_frame_fu.
PER_FRAME = {
    loss_fu: per_frame_fu,
    loss_fu_dy: per_frame_fu,
    loss_kl: per_frame_kl,
    loss_ml: per_frame_ml,
}

LOSSES = {"fu": loss_fu, "fu_dy": loss_fu_dy, "kl": loss_kl, "ml": loss_ml}
