"""Test harness: force JAX onto CPU with 8 virtual devices so sharding
tests run without a pod (SURVEY.md §4 implication), set before jax import."""

import os

# Force CPU: the surrounding environment pins JAX onto the real TPU (axon
# plugin via sitecustomize); unit tests must run on the virtual 8-device CPU
# mesh.  The env var alone is overridden by the plugin registration, so the
# config update after import is what actually takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite's cost is dominated by XLA:CPU
# compiles of full-pipeline programs at many distinct shapes.  Caching them
# on disk makes repeat runs (the common case while iterating) several times
# faster; the directory is gitignored.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
