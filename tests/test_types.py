"""Core types: RigidTransform algebra and the padded-Cloud contract."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import random_rigid
from tpuslam.core.types import Cloud, RigidTransform, pad_cloud, unpad


def test_compose_matches_sequential_apply(rng):
    r1, t1 = random_rigid(rng, 0.3, 1.0)
    r2, t2 = random_rigid(rng, 0.5, 2.0)
    a = RigidTransform(jnp.asarray(r1), jnp.asarray(t1), jnp.float32(1.3))
    b = RigidTransform(jnp.asarray(r2), jnp.asarray(t2), jnp.float32(0.7))
    pts = jnp.asarray(rng.random((50, 3)).astype(np.float32))
    ab = a.compose(b)
    np.testing.assert_allclose(
        np.asarray(ab.apply(pts)),
        np.asarray(a.apply(b.apply(pts))),
        rtol=1e-5, atol=1e-5,
    )


def test_identity():
    pts = jnp.asarray(np.random.rand(10, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(RigidTransform.identity().apply(pts)), np.asarray(pts)
    )


def test_pad_unpad_roundtrip(rng):
    pts = rng.random((77, 3)).astype(np.float32)
    cloud = pad_cloud(pts)
    assert cloud.padded_size == 128
    assert int(cloud.count) == 77
    np.testing.assert_array_equal(unpad(cloud), pts)
    # padding rows are zero and the mask excludes them
    assert np.all(np.asarray(cloud.points)[77:] == 0)
    m = np.asarray(cloud.mask())
    assert m[:77].all() and not m[77:].any()


def test_register_one_call_api(rng):
    import tpuslam

    before = (rng.random((400, 3)) * 10).astype(np.float32)
    r, t = random_rigid(rng, 0.2, 1.0)
    after = (before @ r.T + t).astype(np.float32)
    rot, trans, iters, err = tpuslam.register(
        before, after, max_iterations=30
    )
    assert err < 1e-3 and iters >= 1
    np.testing.assert_allclose(rot, r, atol=2e-3)
