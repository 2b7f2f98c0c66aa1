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


# ---------------------------------------------------------------------------
# degenerate-spectrum hardening (VERDICT r2 weak #2): rotationally
# near-symmetric clouds make the scatter eigenvectors within the tied
# subspace arbitrary; the reference's random-permutation jitter
# (noniterative.cpp:57-200) only re-rolls that arbitrary basis, so it
# fails these clouds outright.  The widened candidate set samples the
# unresolved in-plane angle, hierarchical rescored grids refine it, and
# a short Procrustes polish absorbs the residual.
# ---------------------------------------------------------------------------

def degenerate_cylinder(rng, n=6000):
    """Near-degenerate spectrum (in-plane eigengap ~2-4%, under the 5%
    threshold): a cylinder about z plus three thin ridges at angles
    {0, 90, 210} deg on mixed halves.  One or two features create
    accidental flip symmetries (a z-flip about the bisector maps them
    onto each other — measured to fool the exact rescore); three at
    unequal angles/halves leave no symmetry, so registration is
    well-posed while the second/third eigenvalues still tie."""
    theta = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    z = rng.uniform(-2, 2, n).astype(np.float32)
    pts = [np.stack(
        [np.cos(theta), np.sin(theta), z], axis=1
    ).astype(np.float32)]
    nr = max(n // 33, 1)
    for ang, (zlo, zhi) in (
        (0.0, (0.5, 2)), (90.0, (-2, -0.5)), (210.0, (0.5, 2)),
    ):
        zz = rng.uniform(zlo, zhi, nr).astype(np.float32)
        a = np.radians(ang)
        ridge = np.stack([
            np.full(nr, 1.35 * np.cos(a), np.float32)
            + rng.normal(0, 0.01, nr).astype(np.float32),
            np.full(nr, 1.35 * np.sin(a), np.float32)
            + rng.normal(0, 0.01, nr).astype(np.float32),
            zz,
        ], axis=1)
        pts.append(ridge)
    return np.concatenate(pts)


def degenerate_pair(rng, angle_deg=70.0):
    """Disjoint-sample pair (the regime where tied eigenvectors actually
    decorrelate between the two sides — an exact rigid copy keeps them
    consistent and hides the failure) with a known in-plane transform."""
    allp = degenerate_cylinder(rng)
    perm = rng.permutation(len(allp))
    before = allp[perm[: len(allp) // 2]]
    after_src = allp[perm[len(allp) // 2:]]
    r = rot_z(np.radians(angle_deg))
    t = np.array([0.5, -1.0, 2.0], np.float32)
    after = (after_src @ r.T + t).astype(np.float32)
    return before, after, r, t


def rot_z(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def gt_mse_of(before, r, t, rot, tr):
    rot, tr = np.asarray(rot), np.asarray(tr)
    return float(np.mean(np.sum(
        (before @ rot.T + tr - (before @ r.T + t)) ** 2, -1
    )))


def test_degenerate_detection(rng):
    from tpuslam.algorithms.nicp import degenerate_axes_for, spectrum_gaps

    cyl = degenerate_cylinder(rng)
    g12, g23 = spectrum_gaps(cyl)
    assert g23 < 0.05 < g12  # cylinder: distinct axis + tied plane
    assert degenerate_axes_for(cyl, cyl) == (0,)

    # sphere shell: everything ties
    v = rng.standard_normal((4000, 3)).astype(np.float32)
    sphere = v / np.linalg.norm(v, axis=1, keepdims=True)
    assert degenerate_axes_for(sphere, sphere) == (0, 2)

    # anisotropic cloud: no widening
    assert degenerate_axes_for(
        anisotropic_cloud(rng, 2000), anisotropic_cloud(rng, 2000)
    ) == ()


def test_nicp_cylinder_degenerate_recovery(rng):
    # 70-degree in-plane rotation about the cylinder axis: between the
    # 4 sign candidates AND off the 22.5-degree widened grid, so only
    # widening + hierarchical refinement can recover it
    before, after, r, t = degenerate_pair(rng)
    cb, ca = pad_cloud(before), pad_cloud(after)
    kw = dict(degenerate_angles=16, degenerate_axes=(0,), seed=1,
              subcloud_size=2000)
    widened = nicp_register(cb, ca, **kw)
    rot = np.asarray(widened.transform.rotation)
    assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-3)
    mse_w = gt_mse_of(before, r, t, rot, widened.transform.translation)
    assert mse_w < 2e-3

    # determinism: eigenvector ambiguity must not flip the result
    again = nicp_register(cb, ca, **kw)
    np.testing.assert_array_equal(
        rot, np.asarray(again.transform.rotation)
    )

    # and strictly better than the unwidened 4-candidate enumeration
    base = nicp_register(cb, ca, seed=1, subcloud_size=2000)
    mse_b = gt_mse_of(
        before, r, t, base.transform.rotation,
        base.transform.translation,
    )
    assert mse_w < mse_b / 10


def test_nicp_degenerate_auto_via_registry(rng):
    # the registry's host-side eigengap pre-pass must trigger widening
    # without any config knob (nicp-degenerate-widening absent = auto)
    from tpuslam.algorithms.registry import run_with_configuration
    from tpuslam.config.configuration import (
        ComputationMethod,
        Configuration,
    )

    before, after, r, t = degenerate_pair(rng)
    config = Configuration(
        computation_method=ComputationMethod.NoniterativeIcp,
        random_seed=1,
        nicp_subcloud_size=2000,
    )
    rot, tr, iters, err = run_with_configuration(before, after, config)
    assert gt_mse_of(before, r, t, rot, tr) < 2e-3

    # explicit opt-out reproduces the unwidened behavior
    config_off = Configuration(
        computation_method=ComputationMethod.NoniterativeIcp,
        random_seed=1,
        nicp_subcloud_size=2000,
        nicp_degenerate_widening=0,
    )
    rot0, tr0, _, _ = run_with_configuration(before, after, config_off)
    assert gt_mse_of(before, r, t, rot0, tr0) > 2e-3


def test_nicp_sphere_never_worse_and_deterministic(rng):
    # full SO(3) degeneracy (sphere shell): per-axis in-plane sampling
    # cannot cover it — documented limitation.  The hardened path must
    # still be deterministic and never-worse: the recovered transform
    # maps the shell onto itself (shape-level error), even though the
    # per-point gt transform is unrecoverable in principle.
    v = rng.standard_normal((4000, 3)).astype(np.float32)
    before = v / np.linalg.norm(v, axis=1, keepdims=True)
    r, t = random_rigid(rng, angle=1.0, trans=2.0)
    after = (before @ r.T + t)[rng.permutation(len(before))].astype(
        np.float32
    )
    cb, ca = pad_cloud(before), pad_cloud(after)
    res1 = nicp_register(
        cb, ca, degenerate_angles=16, degenerate_axes=(0, 2), seed=1
    )
    res2 = nicp_register(
        cb, ca, degenerate_angles=16, degenerate_axes=(0, 2), seed=1
    )
    np.testing.assert_array_equal(
        np.asarray(res1.transform.rotation),
        np.asarray(res2.transform.rotation),
    )
    rot = np.asarray(res1.transform.rotation)
    assert np.linalg.det(rot) == pytest.approx(1.0, abs=1e-3)
    # shape-level: transformed unit sphere centered at t with radius 1
    moved = before @ rot.T + np.asarray(res1.transform.translation)
    radii = np.linalg.norm(moved - t, axis=1)
    np.testing.assert_allclose(radii, 1.0, atol=0.05)
