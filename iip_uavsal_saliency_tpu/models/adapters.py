"""Zoo-model adapters: one stateful training interface for every variant.

The ablation zoo (reference: model.py:558-1076, SURVEY M11) mixes three call
signatures: stateless `f(x)`, prior-fed `f(x, gauss, ob)`, and stateful
`f(x5, gauss, ob, state)`. `ZooModelAdapter` duck-types UAVSal's
`apply(variables, x5, gauss, ob, state) -> (out5, new_state)` over all of
them, so the Trainer / train-eval steps / graft entry work unchanged for any
zoo variant (`TrainConfig.model_name`). Stateless models carry a (V, 1)
zeros dummy state through the jit boundary (static shapes, no recompiles).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .uavsal import MODEL_ZOO, UAVSal, UAVSalLSTM, UAVSalMP, build_model

# signature kinds per zoo name
_STATELESS = {
    "uavsal_spconv", "uavsal_teconv", "uavsal_stblocks", "uavsal_stblocks_type",
    "uavsal_stc3d", "uavsal_stc2_3d",
}
_PRIORS_ONLY = {"uavsal_mp"}
_STATEFUL = {"uavsal", "uavsal_lstm"}


class ZooModelAdapter:
    """Wraps a zoo model behind the UAVSal stateful interface."""

    def __init__(self, name: str, model):
        name = name.lower()
        if name not in MODEL_ZOO:
            raise KeyError(name)
        self.name = name
        self.model = model
        self.kind = (
            "stateful" if name in _STATEFUL
            else "priors" if name in _PRIORS_ONLY
            else "stateless"
        )

    def init_state(self, height: int, width: int, n_videos: int = 1, dtype=jnp.float32):
        if self.kind == "stateful":
            return self.model.init_state(height, width, n_videos, dtype)
        # jit-friendly dummy carry; rank-4 (V, 8, 8, 1) so the mesh-sharded
        # steps' rank-4 (data, spatial, ., .) state sharding still applies
        return jnp.zeros((n_videos, 8, 8, 1), dtype)

    def _model_for(self, x):
        """Per-video bounding for flattened multi-video batches (V>1): the
        temporal-difference stencil and the t-major context tile must never
        cross video boundaries (the native UAVSal applies the same guards at
        uavsal.py:208,217). V=1 keeps exact reference behavior."""
        v, s = x.shape[0], x.shape[1]
        if v <= 1 or self.kind == "stateful":
            return self.model
        if self.kind == "priors":  # UAVSalMP: trunk diffs AND context tile
            return self.model.clone(compat_cxt_tile=False, diff_group=s)
        if "diff_group" in type(self.model).__dataclass_fields__:
            return self.model.clone(diff_group=s)
        return self.model  # spconv / 3D variants: no cross-video op at V>1

    def _call_args(self, x, gauss, ob, state):
        if self.kind == "stateful":
            return (x, gauss, ob, state)
        v, s = x.shape[0], x.shape[1]
        xf = x.reshape(v * s, *x.shape[2:])
        if self.kind == "priors":
            return (xf, gauss, ob)
        return (xf,)

    def _wrap_out(self, y, x, state):
        if self.kind == "stateful":
            return y  # (out5, new_state)
        if isinstance(y, tuple):  # UAVSalSTBlocks returns (out, features)
            y = y[0]
        v, s = x.shape[0], x.shape[1]
        return y.reshape(v, s, *y.shape[1:]), state

    def apply(self, variables, x, gauss, ob, state, train: bool = False,
              mutable: Any = False):
        args = self._call_args(x, gauss, ob, state)
        out = self._model_for(x).apply(variables, *args, train=train, mutable=mutable)
        if mutable:
            y, mutated = out
            return self._wrap_out(y, x, state), mutated
        return self._wrap_out(out, x, state)

    def init(self, rngs, x, gauss, ob, state, **kwargs):
        return self._model_for(x).init(
            rngs, *self._call_args(x, gauss, ob, state), **kwargs
        )


def build_adapted_model(name: str = "uavsal", filter_kwargs: bool = False,
                        **kwargs):
    """Model (or adapter with the UAVSal interface) for any zoo name.

    `filter_kwargs=True` drops kwargs the variant doesn't declare (e.g. the
    SpConv ablation has no time_dims, the stateless ones no bias_type) so
    one config dict drives every zoo name — the Trainer and the inference
    loader both go through this."""
    name = name.lower()
    if filter_kwargs:
        import dataclasses

        fields = {f.name for f in dataclasses.fields(MODEL_ZOO[name])}
        kwargs = {k: v for k, v in kwargs.items() if k in fields}
    model = build_model(name, **kwargs)
    if name == "uavsal":
        return model  # the native interface, no wrapping
    return ZooModelAdapter(name, model)
