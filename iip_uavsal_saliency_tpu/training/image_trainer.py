"""SALICON image-stage training (SRF-Net pretraining).

The reference pipeline fine-tunes SRF-Net on SALICON before video training
(reference: README.md:60) but ships no in-tree script for it — only the
dataset (dataset.py:27-115) and image metric drivers (utils_score.py:570-682).
This module supplies that stage: a jitted train step over `SRFNetImage` with
the same composite loss and Adam recipe, early stopping, and checkpoints
name-compatible with `transfer_sfnet` into the video model.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.images import salicon_batches
from ..models import init_variables
from ..models.srfnet_image import SRFNetImage
from ..utils.logging import get_logger
from .checkpoint import save_checkpoint
from .losses import loss_fu
from .optim import make_optimizer

log = get_logger("image_trainer")


@dataclasses.dataclass
class ImageTrainConfig:
    method_name: str = "SRFNet"
    cnn_type: str = "mobilenet_v2"
    iosize: Tuple[int, int, int, int] = (480, 640, 60, 80)  # reference dataset.py:90
    batch_size: int = 4
    epochs: int = 10
    learning_rate: float = 1e-4
    weight_decay: float = 5e-5
    is_early_stop: bool = True
    max_patience: int = 4


def train_salicon(
    config: ImageTrainConfig,
    data_root: str,
    save_model_dir: str,
    pre_variables=None,
    rng_seed: int = 0,
):
    """Train SRFNetImage on a SALICON-layout dataset. Returns (model, best
    variables)."""
    in_h, in_w = config.iosize[0], config.iosize[1]
    model = SRFNetImage(cnn_type=config.cnn_type)

    if pre_variables is None:
        dummy = jnp.zeros((1, in_h, in_w, 3), jnp.float32)
        variables = init_variables(model, jax.random.PRNGKey(rng_seed), dummy)
    else:
        variables = pre_variables

    tx = make_optimizer(config.learning_rate, config.weight_decay)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return loss_fu(pred, y), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, x, y):
        pred = model.apply({"params": params, "batch_stats": batch_stats}, x)
        return loss_fu(pred, y)

    params, batch_stats = variables["params"], variables["batch_stats"]
    model_dir = os.path.join(save_model_dir, config.method_name)
    os.makedirs(model_dir, exist_ok=True)
    prefix = os.path.join(model_dir, config.method_name)

    best_loss, best = np.inf, (params, batch_stats)
    patience = config.max_patience
    for epoch in range(config.epochs):
        t0, n, total = time.time(), 0, 0.0
        for x, y in salicon_batches(
            data_root, "train", config.iosize, config.batch_size, drop_last=True,
            rng=np.random.RandomState(rng_seed + epoch),
        ):
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y)
            )
            total += float(loss)
            n += 1
        train_loss = total / max(n, 1)

        n, total = 0, 0.0
        # per-example accounting so the (kept) ragged tail batch isn't
        # over-weighted; drop_last=True here would silently zero val_loss on
        # val sets smaller than batch_size and corrupt early stopping
        for x, y in salicon_batches(
            data_root, "val", config.iosize, config.batch_size, drop_last=False
        ):
            total += float(eval_step(params, batch_stats, jnp.asarray(x), jnp.asarray(y))) * x.shape[0]
            n += x.shape[0]
        val_loss = total / n if n else float("inf")
        log.info(
            "epoch %02d: train %.4f val %.4f (%.1fs)",
            epoch, train_loss, val_loss, time.time() - t0,
        )

        save_checkpoint(
            f"{prefix}_{epoch:02d}_{val_loss:.4f}.ckpt",
            {"params": params, "batch_stats": batch_stats},
        )
        if val_loss < best_loss:
            best_loss, best = val_loss, (params, batch_stats)
            patience = config.max_patience
        elif config.is_early_stop:
            patience -= 1
            if patience <= 0:
                log.info("early stop at epoch %d (best %.4f)", epoch, best_loss)
                break

    variables = {"params": best[0], "batch_stats": best[1]}
    save_checkpoint(f"{prefix}_final.ckpt", variables)
    return model, variables
