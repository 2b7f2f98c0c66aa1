"""NICP: deterministic sign-enumeration one-shot registration.

Oracle: self-registration with a known injected rigid transform (the
reference's own fixture strategy, ``testset.cpp:10-11``) — the recovered
(R, t) must match the injected one, and R must be a proper rotation
(det=+1, R R^T = I), asserted as *properties* rather than sign layouts
(SURVEY §2.7 on gesvd sign conventions).
"""

import numpy as np
import pytest

from tests.conftest import random_rigid
from tpuslam.algorithms.nicp import nicp_register
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud


def anisotropic_cloud(rng, n):
    """Cloud with well-separated principal axes (NICP, like the reference's,
    needs a non-degenerate inertia spectrum to pick candidate axes)."""
    pts = rng.random((n, 3)).astype(np.float32) - 0.5
    return (pts * np.array([10.0, 4.0, 1.5], dtype=np.float32)).astype(
        np.float32
    )


def check_recovered(result, before, r, t, tol=2e-2):
    rot = np.asarray(result.transform.rotation)
    trans = np.asarray(result.transform.translation)
    assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-3)
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(rot, r, atol=tol)
    np.testing.assert_allclose(trans, t, atol=tol * 10)
    # transformed before must land on its ground-truth target positions
    mse = np.mean(
        np.sum((before @ rot.T + trans - (before @ r.T + t)) ** 2, axis=-1)
    )
    assert mse < 1e-3


@pytest.mark.parametrize(
    "mode",
    [ApproximationType.NONE, ApproximationType.Hybrid],
)
def test_recovers_transform_shuffled(rng, mode):
    before = anisotropic_cloud(rng, 700)
    r, t = random_rigid(rng, angle=0.4, trans=5.0)
    # independent shuffles: index pairing carries no information, the exact
    # (subcloud-NN) scoring must still pick the right candidate
    after = (before @ r.T + t)[rng.permutation(700)]
    result = nicp_register(
        pad_cloud(before), pad_cloud(after), approximation_type=mode, seed=3
    )
    check_recovered(result, before, r, t)


def test_full_mode_index_aligned(rng):
    # Full mode ranks by the crude index-order score (noniterative.cpp:53),
    # meaningful only when clouds are index-aligned
    before = anisotropic_cloud(rng, 500)
    r, t = random_rigid(rng, angle=0.3, trans=2.0)
    after = before @ r.T + t
    result = nicp_register(
        pad_cloud(before),
        pad_cloud(after),
        approximation_type=ApproximationType.Full,
    )
    check_recovered(result, before, r, t)


def test_padding_invariance(rng):
    before = anisotropic_cloud(rng, 300)
    r, t = random_rigid(rng)
    after = before @ r.T + t
    res_a = nicp_register(
        pad_cloud(before, multiple=128), pad_cloud(after, multiple=128)
    )
    res_b = nicp_register(
        pad_cloud(before, multiple=512), pad_cloud(after, multiple=512)
    )
    np.testing.assert_allclose(
        np.asarray(res_a.transform.rotation),
        np.asarray(res_b.transform.rotation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_a.transform.translation),
        np.asarray(res_b.transform.translation),
        atol=1e-4,
    )


def test_small_cloud_smaller_than_subcloud(rng):
    # cloud smaller than nicp-subcloud-size: whole cloud used
    # (common.cpp:27-28 early return)
    before = anisotropic_cloud(rng, 80)
    r, t = random_rigid(rng)
    after = before @ r.T + t
    result = nicp_register(
        pad_cloud(before), pad_cloud(after), subcloud_size=1000
    )
    check_recovered(result, before, r, t)


def test_candidate_count_reported(rng):
    before = anisotropic_cloud(rng, 200)
    after = before.copy()
    result = nicp_register(pad_cloud(before), pad_cloud(after))
    # exactly the 4 proper-rotation sign candidates are scored
    assert int(result.iterations) == 4


def test_real_cloud(rng):
    from tpuslam.data.loader import load_cloud

    cloud = load_cloud("/root/reference/data/bunny.obj")
    before = cloud[rng.permutation(len(cloud))[:2000]]
    r, t = random_rigid(rng, angle=0.5, trans=10.0)
    after = (before @ r.T + t)[rng.permutation(2000)]
    result = nicp_register(
        pad_cloud(before),
        pad_cloud(after),
        approximation_type=ApproximationType.NONE,
        seed=1,
    )
    rot = np.asarray(result.transform.rotation)
    trans = np.asarray(result.transform.translation)
    mse = np.mean(np.sum((before @ rot.T + trans - before @ r.T - t) ** 2, -1))
    assert mse < 1e-4
