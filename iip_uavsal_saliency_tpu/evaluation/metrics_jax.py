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


METRICS_JAX = {
    "KLD": eval_kl,
    "CC": eval_cc,
    "NSS": eval_nss,
    "SIM": eval_sim,
    "AUC_Judd": eval_auc_judd,
}
