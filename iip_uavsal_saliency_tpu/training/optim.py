"""Optimizer construction: torch-Adam-compatible, with subtree freezing.

The reference trains with `torch.optim.Adam(params, lr, betas=(0.9, 0.999),
weight_decay=...)` over `requires_grad` params only, freezing `sfnet` and
`st_layer` during fine-tuning (reference: Demo_Train_Test.py:59-69).

torch Adam's `weight_decay` is L2-added-to-gradient BEFORE the moment
updates (not decoupled AdamW), reproduced here as
`add_decayed_weights` placed ahead of `scale_by_adam`. Freezing is an optax
mask (`set_to_zero` on frozen subtrees), which also keeps the frozen params
out of the Adam moments — matching "optimizer over trainable params only".
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import jax
import optax


def make_frozen_mask(params, frozen_prefixes: Sequence[str]) -> "jax.tree_util.PyTreeDef":
    """Pytree of bools: True == trainable. A param is frozen when the '/'
    joined path of its top-level keys starts with any prefix, e.g.
    ('trunk/sfnet', 'trunk/st_layer')."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        keys = [getattr(k, "key", str(k)) for k in path]
        joined = "/".join(str(k) for k in keys)
        return not any(joined.startswith(p) for p in frozen_prefixes)

    treedef = jax.tree_util.tree_structure(params)
    leaves = [trainable(path) for path, _ in flat]
    # a prefix matching NOTHING is almost always a naming mistake (e.g. the
    # flagship's default 'trunk/sfnet' against a zoo model whose params are
    # top-level 'sfnet'): silently training everything diverges from the
    # intended recipe, so say so loudly
    for p in frozen_prefixes:
        if not any(
            "/".join(str(getattr(k, "key", k)) for k in path).startswith(p)
            for path, _ in flat
        ):
            import logging

            logging.getLogger("uavsal.train").warning(
                "freeze prefix %r matches no parameter — nothing frozen by it "
                "(param roots: %s)", p, sorted(params)[:8],
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 5e-5,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas, weight_decay) equivalent; optionally masked."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map(lambda t: "train" if t else "frozen", trainable_mask),
        )
    return tx
