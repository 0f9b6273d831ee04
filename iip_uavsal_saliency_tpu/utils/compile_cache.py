"""Persistent XLA compile-cache setup, shared by every entry point.

One policy, one place (bench.py, __graft_entry__.py, and any user script):

- the cache lives at `<repo>/.jax_cache` (gitignored);
- it is seeded copy-if-missing from the committed `<repo>/serving_cache/`
  (built on a TPU by tools/warm_cache.py), so a fresh checkout pays seconds
  instead of the ~6 min full-model XLA compile (BENCH_r03: 376.7 s);
- `jax_remove_custom_partitioning_ptr_from_cache_key` is set because the
  Pallas TWA sharding rule serializes a Python POINTER into the module —
  without the flag, cache keys change across processes and the shipped
  cache never hits.

Key-safety: entries are keyed on the optimized HLO + compile options +
jaxlib/backend versions, so a stale or foreign entry can only MISS (normal
compile); it can never load a wrong program.

Note for tool authors: on this platform the compile options embed the cache
DIRECTORY PATH itself, so entries only hit when produced under the same
absolute `.jax_cache` path — warm the real path (tools/warm_cache.py does),
never a scratch dir.
"""

from __future__ import annotations

import os
import shutil


def setup_compile_cache(repo_dir: str, seed: bool = True) -> int:
    """Configure jax's persistent compile cache for this checkout.

    Seeds `<repo_dir>/.jax_cache` from `<repo_dir>/serving_cache` (unless
    `seed=False` or UAVSAL_SKIP_CACHE_SEED is set — tools/warm_cache.py sets
    it so a warming run compiles, and therefore re-captures, every program
    it needs). Returns the number of entries seeded. Call before the first
    jit compilation; safe to call more than once.
    """
    import jax

    cache = os.path.join(repo_dir, ".jax_cache")
    ship = os.path.join(repo_dir, "serving_cache")
    seeded = 0
    if seed and not os.environ.get("UAVSAL_SKIP_CACHE_SEED") and os.path.isdir(ship):
        os.makedirs(cache, exist_ok=True)
        for f in os.listdir(ship):
            if f == "MANIFEST.json":  # provenance record, not a cache entry
                continue
            dst = os.path.join(cache, f)
            if not os.path.exists(dst):
                shutil.copyfile(os.path.join(ship, f), dst)
                seeded += 1
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)
    return seeded
