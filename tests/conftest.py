"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes its backends.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the TPU
# tunnel), which serializes across processes — tests must never touch it.
# The axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax BEFORE
# this conftest runs, so setting the env var alone is too late; the
# jax.config.update below overrides the already-read env default. XLA_FLAGS
# is still read lazily at first backend init, so setting it here works.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) == 8, "tests need 8 virtual CPU devices"

# Persistent compilation cache: the test machine has a single CPU core, so
# compiles of the full model graph dominate wall time. Cache them on disk —
# the first run pays, every later run (and the driver's run) is near-free.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# custom_partitioning serializes a Python pointer into modules; strip it so
# test-suite cache entries hit across processes/sessions
jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)


# Canonical small UAVSal instance shared by model/convert/sharding tests.
# H, W multiples of 32 so every pyramid stage is exercised.
SMALL_H, SMALL_W, SMALL_T = 64, 128, 5


@pytest.fixture(scope="session")
def uavsal_small():
    """(model, variables, (x, gauss, ob, state)) at 64x128, jit-initialized."""
    from iip_uavsal_saliency_tpu.models import UAVSal, init_variables

    model = UAVSal(time_dims=SMALL_T)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, SMALL_T, SMALL_H, SMALL_W, 3).astype(np.float32))
    g = jnp.asarray(rng.rand(SMALL_H // 8, SMALL_W // 8, 8).astype(np.float32))
    o = jnp.asarray(rng.rand(SMALL_H // 8, SMALL_W // 8, 20).astype(np.float32))
    s = model.init_state(SMALL_H, SMALL_W, 1)
    variables = init_variables(model, jax.random.PRNGKey(0), x, g, o, s)
    return model, variables, (x, g, o, s)
