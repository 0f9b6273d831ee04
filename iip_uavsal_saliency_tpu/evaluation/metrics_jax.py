"""Device-side (batched, jit-able) saliency metrics.

Equivalents of the reference's torch metric suite
(reference: utils_score_torch.py:180-218 for KLD/CC/NSS/SIM and :53-88 for
AUC-Judd). Layout: pred (N, H, W, 1); true (N, H, W, 2) with
channel 0 = fixation map, channel 1 = binary fixation points.

AUC-Judd is computed in closed form from the descending sort: the reference's
ROC polyline has a vertex per fixation with tp_j = j/n_fix and
fp_j = (#pixels above threshold_j - j)/n_nonfix, integrated with the
trapezoid rule (utils_score_torch.py:61-73). For distinct values (the
reference's own 1e-7 jitter guarantees this) the trapezoid sum telescopes to a
per-negative-pixel weight: a non-fixated pixel with c fixations ranked above
it contributes min((2c+1)/(2 n_fix), 1) / n_nonfix. This is one sort + one
cumsum — static shapes, fully batched on TPU — instead of the reference's
per-threshold Python loop, and agrees with the sweep to float precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..training.losses import metric_cc, metric_kl, metric_nss, metric_sim

EPS = 2.2204e-16

KEYS_ORDER = ["AUC_shuffled", "NSS", "AUC_Judd", "AUC_Borji", "KLD", "SIM", "CC"]


def eval_kl(y_pred, y_true):
    return metric_kl(y_pred, y_true)


def eval_cc(y_pred, y_true):
    return metric_cc(y_pred, y_true)


def eval_nss(y_pred, y_true):
    return metric_nss(y_pred, y_true)


def eval_sim(y_pred, y_true):
    return metric_sim(y_pred, y_true)


def eval_auc_judd(y_pred, y_true, jitter_key=None):
    """Batched AUC-Judd. Returns NaN for frames with no fixations or an
    all-zero saliency map, matching reference utils_score_torch.py:54-55.

    `jitter_key` breaks ties uniformly at random — the exact infinitesimal
    limit of the reference's `+ rand()*1e-7` (utils_score_torch.py:79,
    utils_score.py:54-56). An additive 1e-7 would be swallowed by f32 on
    0..255-scale salmaps (f32 eps at 255 is ~1.5e-5), so instead the
    descending sort uses a random uniform as the secondary lexsort key:
    tied pixels are ordered uniformly at random, which is distribution-
    identical to jittering before the sort."""
    n, h, w, _ = y_pred.shape
    s = y_pred.reshape(n, h * w)
    f = (y_true[..., 1] > 0.5).reshape(n, h * w)

    smin = jnp.min(s, axis=1, keepdims=True)
    smax = jnp.max(s, axis=1, keepdims=True)
    s = (s - smin) / (smax - smin + EPS)

    # descending sort; carry the fixation indicator along
    if jitter_key is not None:
        u = jax.random.uniform(jitter_key, s.shape)
        order = jnp.lexsort((u, -s), axis=-1)
    else:
        order = jnp.argsort(-s, axis=1)
    f_sorted = jnp.take_along_axis(f, order, axis=1)

    n_fix = jnp.sum(f, axis=1)
    n_non = h * w - n_fix

    # fixations ranked at-or-above each position; at non-fix positions this
    # equals the count strictly above (the position itself is not a fixation)
    cfix = jnp.cumsum(f_sorted.astype(jnp.float32), axis=1)
    w_seg = jnp.minimum(
        (2.0 * cfix + 1.0) / (2.0 * jnp.maximum(n_fix, 1)[:, None]), 1.0
    )
    auc = jnp.sum(jnp.where(f_sorted, 0.0, w_seg), axis=1) / jnp.maximum(n_non, 1)

    valid = (n_fix > 0) & (jnp.max(y_pred.reshape(n, -1), axis=1) > 0)
    return jnp.where(valid, auc, jnp.nan)


def eval_auc_sweep(y_pred, y_true, neg_idx, n_valid, step_size=0.1):
    """Batched AUC-Borji / shuffled-AUC threshold sweep on device.

    The reference keeps these on the host because the negative sampling and
    the threshold grid are data-dependent (utils_score_torch.py:91-177).
    Batched TPU form: the host samples only the negative PIXEL INDICES
    (cheap), and the sweep runs with a FIXED threshold grid
    arange(0, 1, step) — provably area-equivalent to the reference's
    arange(0, upper, step): thresholds above `upper` count zero positives
    and zero negatives, contributing duplicate (0,0) curve points that the
    trapezoid rule ignores. Positive counts come from the full frame under
    the fixation mask (no ragged gather); negative rows >= n_valid[i] are
    masked out.

    y_pred (N,H,W,1); y_true (N,H,W,2) (channel 1 = fixation points);
    neg_idx (N, NF, R) int32 flat pixel indices (R = random splits);
    n_valid (N,) valid rows per frame — n_fix for Borji,
    min(n_fix, #shufmap-fixations) for shuffled (also the fp denominator,
    matching the reference). Returns (N,) mean AUC over the R splits, NaN
    for degenerate frames.
    """
    n, h, w, _ = y_pred.shape
    p = h * w
    s_raw = y_pred.astype(jnp.float32).reshape(n, p)
    f = (y_true[..., 1].astype(jnp.float32) > 0.5).reshape(n, p)

    smin = jnp.min(s_raw, axis=1, keepdims=True)
    smax = jnp.max(s_raw, axis=1, keepdims=True)
    sn = (s_raw - smin) / (smax - smin + EPS)

    n_fix = jnp.sum(f, axis=1)
    nf, r = neg_idx.shape[1], neg_idx.shape[2]
    row_ok = jnp.arange(nf)[None, :, None] < n_valid[:, None, None]
    neg = jnp.take_along_axis(sn, neg_idx.reshape(n, nf * r), axis=1)
    neg = neg.reshape(n, nf, r)

    # static descending threshold grid (python floats -> no giant (N,T,P)
    # intermediate: one (N,P) reduction per threshold)
    import math

    nt = int(math.ceil(1.0 / step_size))
    thresholds = [step_size * t for t in range(nt - 1, -1, -1)]
    denom_fix = jnp.maximum(n_fix, 1).astype(jnp.float32)
    denom_neg = jnp.maximum(n_valid, 1).astype(jnp.float32)
    tp_list, fp_list = [], []
    for t in thresholds:
        tp_list.append(jnp.sum((sn >= t) & f, axis=1) / denom_fix)
        fp_list.append(
            jnp.sum((neg >= t) & row_ok, axis=1) / denom_neg[:, None]
        )
    tp = jnp.stack(tp_list, axis=1)[:, :, None]  # (N, T, 1)
    tp = jnp.broadcast_to(tp, (n, nt, r))
    fp = jnp.stack(fp_list, axis=1)  # (N, T, R)

    zeros = jnp.zeros((n, 1, r))
    ones = jnp.ones((n, 1, r))
    tp = jnp.concatenate([zeros, tp, ones], axis=1)
    fp = jnp.concatenate([zeros, fp, ones], axis=1)
    auc = jnp.trapezoid(tp, fp, axis=1).mean(axis=1)

    # matches the host rule, which checks np.any(s > 0) AFTER norm01: a
    # constant frame (max == min) normalizes to zeros and must be NaN
    valid = (n_fix > 0) & (smax[:, 0] > smin[:, 0]) & (n_valid > 0)
    return jnp.where(valid, auc, jnp.nan)


METRICS_JAX = {
    "KLD": eval_kl,
    "CC": eval_cc,
    "NSS": eval_nss,
    "SIM": eval_sim,
    "AUC_Judd": eval_auc_judd,
}
