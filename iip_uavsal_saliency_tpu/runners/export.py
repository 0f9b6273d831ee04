"""AOT serving artifacts: the whole serving step as one self-contained file.

`export_serving` bakes EVERYTHING the serving step needs — folded/cast
params, BN stats, and the prior maps — into a single `jax.export` StableHLO
module with a fixed input signature

    step(frames_uint8 (V, S, H, W, 3), state (V, H/8, W/8, C)) -> (sal, state)

and writes it next to a small JSON header (shapes, dtypes, iosize,
postprocess metadata). `ExportedServing` loads the artifact and serves it —
including through the production `test_videos` pipeline (`run_exported`) —
WITHOUT the model code, checkpoint, or prior files: deployment needs the
artifact and this loader, nothing else. The reference has no equivalent;
its serving needs the full source tree + torchvision + the pickled module
(reference: Demo_Test.py:30-44).

Notes
-----
- jax.export serializes StableHLO, which is versioned and stable across
  jax releases (unlike the pickled-nn.Module reference checkpoints that
  break when class definitions move). Backend compilation still happens on
  the first call of a fresh process; it rides the persistent compile cache
  (utils/compile_cache.py), same as the live path.
- Exporting ON a TPU host bakes the fused Pallas TWA kernel; exporting on a
  CPU host with `platforms=["tpu"]` cross-lowers with the XLA-scan TWA (the
  kernel gate reads the trace-time backend — a perf fallback, not a
  correctness one, docs/PERF.md "Fused Pallas TWA").
- uint8 normalization and (for bf16 artifacts) all dtype casts happen
  INSIDE the module: callers feed decoded uint8 letterboxed frames and an
  f32 zero state.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Optional, Sequence, Tuple

import numpy as np

MAGIC = b"UAVSALAOT1"
FORMAT_VERSION = 1


def export_serving(
    model,
    variables,
    *,
    iosize: Tuple[int, int, int, int] = (360, 640, 45, 80),
    batch_size: int = 16,
    time_dims: int = 5,
    videos_per_batch: int = 1,
    bias_type: Sequence[int] = (1, 1, 1),
    gauss=None,
    ob=None,
    compute_dtype=None,
    platforms: Optional[Sequence[str]] = None,
):
    """Export the serving step with params/stats/priors baked in.

    Returns (exported, meta): a jax.export.Exported and the JSON-able
    header dict. `batch_size` is clips per step (S = batch_size*time_dims
    frames — the artifact's step shape is FIXED; pick the tuned serving
    shape, S=80 on v5e). `compute_dtype=jnp.bfloat16` bakes the bf16
    serving path (params pre-cast, casts fused in-graph).
    """
    import jax
    import jax.numpy as jnp

    from ..parallel.steps import make_infer_step

    shape_r, shape_c, shape_r_out, shape_c_out = iosize
    if gauss is not None:
        gauss = jnp.asarray(gauss)
    if ob is not None:
        ob = jnp.asarray(ob)
    if compute_dtype is not None:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if np.asarray(a).dtype == np.float32 else a,
            variables,
        )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # donate_state=False: jax.export rejects donated arguments (the loaded
    # artifact manages its own buffers); the in-place state reuse is a
    # live-path-only optimization
    infer_step = make_infer_step(model, compute_dtype=compute_dtype)

    def serve(x, state):
        return infer_step(params, batch_stats, x, gauss, ob, state)

    v, s = videos_per_batch, batch_size * time_dims
    state0 = model.init_state(shape_r, shape_c, v)
    if compute_dtype is not None:
        # the module RETURNS state in the compute dtype; the input spec must
        # match or the second step of a chained serving loop is rejected
        # ("Dtype mismatch for args[1]") — zero extra casts this way
        state0 = state0.astype(compute_dtype)
    x_spec = jax.ShapeDtypeStruct((v, s, shape_r, shape_c, 3), jnp.uint8)
    s_spec = jax.ShapeDtypeStruct(state0.shape, state0.dtype)
    exported = jax.export.export(
        jax.jit(serve), platforms=list(platforms) if platforms else None
    )(x_spec, s_spec)
    meta = {
        "format_version": FORMAT_VERSION,
        "iosize": list(iosize),
        "batch_size": batch_size,
        "time_dims": time_dims,
        "videos_per_batch": videos_per_batch,
        "bias_type": list(bias_type),
        "compute_dtype": str(np.dtype(compute_dtype).name) if compute_dtype else "float32",
        "x_shape": [v, s, shape_r, shape_c, 3],
        "state_shape": list(state0.shape),
        "state_dtype": str(state0.dtype),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    return exported, meta


def save_exported(path: str, exported, meta: dict) -> None:
    """Write `MAGIC | u32 header_len | header JSON | module bytes`."""
    header = json.dumps(meta).encode("utf-8")
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)


class ExportedServing:
    """A loaded serving artifact: `step(x_uint8, state) -> (sal, state)`.

    Everything (weights, priors, normalization, dtype policy) is inside the
    module; this class only adds the fixed-shape metadata and a jit wrapper.
    Use `run_exported` to drive the full resumable .mat-writing pipeline.
    """

    def __init__(self, path: str):
        import jax

        with open(path, "rb") as f:
            data = f.read()
        if not data.startswith(MAGIC):
            raise ValueError(f"{path}: not a UAVSal AOT serving artifact")
        off = len(MAGIC)
        (hlen,) = struct.unpack_from("<I", data, off)
        off += 4
        self.meta = json.loads(data[off : off + hlen].decode("utf-8"))
        if self.meta.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: format_version {self.meta['format_version']} is newer "
                f"than this loader ({FORMAT_VERSION})"
            )
        self._exported = jax.export.deserialize(data[off + hlen :])
        self._step = jax.jit(self._exported.call)

    @property
    def iosize(self):
        return tuple(self.meta["iosize"])

    def init_state(self, shape_r: int, shape_c: int, v: int):
        """Zero recurrent state. Shapes are FIXED by the artifact; mismatches
        fail loudly here instead of deep inside the module call."""
        import jax.numpy as jnp

        expect = (self.meta["iosize"][0], self.meta["iosize"][1],
                  self.meta["videos_per_batch"])
        if (shape_r, shape_c, v) != expect:
            raise ValueError(
                f"artifact is fixed to (H, W, V)={expect}, got "
                f"({shape_r}, {shape_c}, {v}) — re-export for other shapes"
            )
        # jnp resolves dtype NAMES incl. 'bfloat16' (np.dtype alone may not)
        return jnp.zeros(tuple(self.meta["state_shape"]), self.meta["state_dtype"])

    def __call__(self, x, state):
        return self._step(x, state)

    def as_infer_step(self):
        """Adapter matching make_infer_step's signature (params/stats/priors
        are baked, so those arguments are ignored) — lets test_videos drive
        the artifact through the exact production pipeline."""

        def step(params, batch_stats, x, gauss, ob, state):
            return self._step(x, state)

        return step


def run_exported(
    input_path: str,
    output_path: str,
    artifact_path: str,
    save_frames: float = float("inf"),
    method_name: Optional[str] = None,
) -> None:
    """Resumable per-video inference from an AOT artifact alone: the same
    decode -> letterbox -> pipelined stateful step -> un-letterbox ->
    uint8 .mat flow as `test_videos` (reference: Demo_Test.py:30-95), with
    every model-side choice frozen inside the artifact."""
    from .infer import test_videos

    art = ExportedServing(artifact_path)
    m = art.meta
    test_videos(
        input_path,
        output_path,
        model=art,
        variables={"params": {}, "batch_stats": {}},
        iosize=tuple(m["iosize"]),
        batch_size=m["batch_size"],
        time_dims=m["time_dims"],
        # priors live inside the module: the runner must not rebuild them
        bias_type=(0, 0, 0),
        save_frames=save_frames,
        method_name=method_name,
        videos_per_batch=m["videos_per_batch"],
        infer_step=art.as_infer_step(),
    )
