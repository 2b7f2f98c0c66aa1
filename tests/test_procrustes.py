"""Weighted Procrustes vs direct NumPy SVD oracle (``common.cpp:517-552``).

Per SURVEY §2.7: we assert rotation PROPERTIES (det=+1, orthogonality,
recovery of known transforms), never U/V sign layouts."""

import numpy as np
import jax.numpy as jnp

from tests.conftest import make_cloud, random_rigid
from tpuslam.ops.procrustes import weighted_procrustes, svd_rotation


def numpy_procrustes(before, after, w):
    total = w.sum()
    mu_b = (before * w[:, None]).sum(0) / total
    mu_a = (after * w[:, None]).sum(0) / total
    h = (w[:, None] * (after - mu_a)).T @ (before - mu_b)
    u, s, vt = np.linalg.svd(h)
    d = np.diag([1.0, 1.0, np.linalg.det(u @ vt)])
    r = u @ d @ vt
    return r, mu_a - r @ mu_b


def test_recovers_exact_rigid_transform(rng):
    cloud = make_cloud(rng, 300)
    r_true, t_true = random_rigid(rng, 0.5, 3.0)
    after = cloud @ r_true.T + t_true
    w = np.ones(300, dtype=np.float32)
    r, t = weighted_procrustes(jnp.asarray(cloud), jnp.asarray(after), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_properness(rng):
    cloud = make_cloud(rng, 100)
    noisy = cloud + rng.normal(0, 0.5, cloud.shape).astype(np.float32)
    w = np.ones(100, dtype=np.float32)
    r, _ = weighted_procrustes(jnp.asarray(cloud), jnp.asarray(noisy), jnp.asarray(w))
    r = np.asarray(r)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) > 0.999


def test_matches_numpy_oracle_with_weights(rng):
    before = make_cloud(rng, 200)
    after = make_cloud(rng, 200)
    w = (rng.random(200) > 0.3).astype(np.float32)
    r, t = weighted_procrustes(jnp.asarray(before), jnp.asarray(after), jnp.asarray(w))
    r_np, t_np = numpy_procrustes(before.astype(np.float64), after.astype(np.float64), w.astype(np.float64))
    np.testing.assert_allclose(np.asarray(r), r_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_np, atol=1e-3)


def test_zero_weight_rows_are_ignored(rng):
    cloud = make_cloud(rng, 100)
    r_true, t_true = random_rigid(rng, 0.4, 2.0)
    after = cloud @ r_true.T + t_true
    # corrupt rows that carry zero weight — result must be unaffected
    before_x = np.concatenate([cloud, rng.random((28, 3)).astype(np.float32) * 99])
    after_x = np.concatenate([after, rng.random((28, 3)).astype(np.float32) * -99])
    w = np.concatenate([np.ones(100), np.zeros(28)]).astype(np.float32)
    r, t = weighted_procrustes(
        jnp.asarray(before_x), jnp.asarray(after_x), jnp.asarray(w)
    )
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)


def test_reflection_becomes_rotation(rng):
    # a reflected correspondence set must still yield det=+1
    cloud = make_cloud(rng, 50)
    reflected = cloud * np.array([-1.0, 1.0, 1.0], dtype=np.float32)
    w = np.ones(50, dtype=np.float32)
    r, _ = weighted_procrustes(
        jnp.asarray(cloud), jnp.asarray(reflected), jnp.asarray(w)
    )
    assert np.linalg.det(np.asarray(r)) > 0.999


def test_svd_rotation_returns_singular_values(rng):
    h = rng.random((3, 3)).astype(np.float32)
    r, s = svd_rotation(jnp.asarray(h))
    s_np = np.linalg.svd(h.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-4)
