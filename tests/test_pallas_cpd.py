"""Pallas CPD E-step vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuslam.algorithms.cpd import (
    cpd_estep,
    sigma_squared_init,
    uniform_constant,
)
from tpuslam.core.types import pad_cloud
from tpuslam.kernels.pallas_cpd import (
    cpd_estep_pallas,
)


@pytest.mark.parametrize("truncate", [False, True])
@pytest.mark.parametrize("nm", [(96, 80), (300, 257), (512, 512)])
def test_matches_jnp_estep(rng, nm, truncate):
    n_moving, n_target = nm
    before = (rng.random((n_moving, 3)) * 4.0 - 2.0).astype(np.float32)
    after = (before[:n_target] + 0.25).astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)
    s2 = sigma_squared_init(cb.points, cb.mask(), ca.points, ca.mask())
    c = uniform_constant(
        s2, jnp.float32(0.3), jnp.float32(n_moving), jnp.float32(n_target)
    )
    args = (cb.points, cb.mask(), ca.points, ca.mask(), s2, c,
            jnp.asarray(truncate))
    want = cpd_estep(*args)
    got = cpd_estep_pallas(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.p1), np.asarray(want.p1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pt1), np.asarray(want.pt1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.px), np.asarray(want.px), rtol=1e-4, atol=1e-5
    )
    assert float(got.error) == pytest.approx(float(want.error), rel=1e-4)
    # padded rows carry no statistics
    assert np.all(np.asarray(got.p1)[n_moving:] == 0)
    assert np.all(np.asarray(got.pt1)[n_target:] == 0)


def test_internal_padding_multi_tile(rng):
    # lane-aligned but not tile-aligned shapes: internal padding to 2048
    # with a mostly-padded second tile (see pallas_nn counterpart)
    n_moving, n_target = 1152, 1280
    before = (rng.random((n_moving, 3)) * 4.0).astype(np.float32)
    after = (rng.random((n_target, 3)) * 4.0).astype(np.float32)
    cb = pad_cloud(before[:1100], multiple=128)
    ca = pad_cloud(after[:1250], multiple=128)
    s2 = sigma_squared_init(cb.points, cb.mask(), ca.points, ca.mask())
    c = uniform_constant(
        s2, jnp.float32(0.3), jnp.float32(1100), jnp.float32(1250)
    )
    args = (cb.points, cb.mask(), ca.points, ca.mask(), s2, c,
            jnp.asarray(False))
    want = cpd_estep(*args)
    got = cpd_estep_pallas(*args, interpret=True)
    assert got.p1.shape == want.p1.shape
    np.testing.assert_allclose(
        np.asarray(got.p1), np.asarray(want.p1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.pt1), np.asarray(want.pt1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.px), np.asarray(want.px), rtol=1e-4, atol=1e-5
    )
