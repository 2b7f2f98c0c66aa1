"""Test configuration: force CPU jax with a virtual 8-device mesh so
multi-chip sharding is exercised without a pod (SURVEY §4)."""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU); override hard so
# tests run on the local CPU backend with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DATA = "/root/reference/data"


@pytest.fixture
def rng():
    return np.random.Generator(np.random.PCG64(666))


def make_cloud(rng: np.random.Generator, n: int, spread: float = 10.0):
    return (rng.random((n, 3), dtype=np.float64) * spread).astype(np.float32)


def random_rigid(rng: np.random.Generator, angle: float = 0.2, trans: float = 1.0):
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
    )

    r = get_random_rotation_matrix(rng, angle)
    t = get_random_translation_vector(rng, trans)
    return r, t
