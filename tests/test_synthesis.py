"""Synthesis pipeline tests: distributional/oracle properties of
``GetCloudsFromConfig`` (``common.cpp:134-210``)."""

import numpy as np
import pytest

from tpuslam.config.configuration import Configuration
from tpuslam.data import synthesis as syn


def test_permutation_roundtrip(rng):
    perm = syn.get_random_permutation(rng, 100)
    inv = syn.inverse_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(100))
    np.testing.assert_array_equal(inv[perm], np.arange(100))


def test_apply_permutation_identity_padding():
    values = np.arange(10, dtype=np.float32)
    perm = np.array([2, 1, 0])
    out = syn.apply_permutation(values, perm)
    # first 3 permuted, rest identity (common.h:100-108)
    np.testing.assert_array_equal(out, [2, 1, 0, 3, 4, 5, 6, 7, 8, 9])


def test_subcloud(rng):
    cloud = rng.random((100, 3)).astype(np.float32)
    sub = syn.get_subcloud(rng, cloud, 10)
    assert sub.shape == (10, 3)
    # each subcloud point is an original point
    assert all((cloud == p).all(axis=1).any() for p in sub)
    # already small enough -> unchanged
    same = syn.get_subcloud(rng, cloud, 200)
    np.testing.assert_array_equal(same, cloud)


def test_normalize_cloud_spread_and_center(rng):
    cloud = (rng.random((500, 3)) * 3.7 + 5.0).astype(np.float32)
    out = syn.normalize_cloud(cloud, 10.0)
    assert syn.cloud_spread(out) == pytest.approx(10.0, rel=1e-5)
    # center of mass is preserved (common.cpp:94 adds it back unscaled)
    np.testing.assert_allclose(out.mean(axis=0), cloud.mean(axis=0), atol=1e-4)


def test_add_noise_share_and_magnitude(rng):
    cloud = (rng.random((1000, 3)) * 10).astype(np.float32)
    spread = syn.cloud_spread(cloud)
    noisy = syn.add_noise(rng, cloud, affected_share=0.25, intensity=0.1)
    moved = np.any(noisy != cloud, axis=1)
    assert moved.sum() <= 250  # a jitter can be exactly zero, but never more
    assert moved.sum() > 200
    deltas = np.abs(noisy - cloud)
    assert deltas.max() <= spread * 0.1 + 1e-5  # per-coordinate bound


def test_add_outliers_in_bbox(rng):
    cloud = (rng.random((100, 3)) * 10).astype(np.float32)
    out = syn.add_outliers(rng, cloud, 50)
    assert out.shape == (150, 3)
    lo, hi = syn.cloud_boundaries(cloud)
    assert (out[100:] >= lo - 1e-6).all() and (out[100:] <= hi + 1e-6).all()


def test_random_rotation_fixed_angle(rng):
    r = syn.get_random_rotation_matrix(rng, 0.3)
    # proper rotation
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)
    # rotation angle is EXACTLY the range value (testutils.cpp:42-47)
    angle = np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1))
    assert angle == pytest.approx(0.3, abs=1e-6)


def test_random_translation_fixed_magnitude(rng):
    t = syn.get_random_translation_vector(rng, 10.0)
    assert np.linalg.norm(t) == pytest.approx(10.0, rel=1e-6)


def test_get_clouds_from_config_oracle(tmp_path):
    # self-registration fixture: same synthetic cloud, known transform
    cloud = (np.random.default_rng(1).random((200, 3)) * 5).astype(np.float32)
    path = tmp_path / "cloud.obj"
    lines = [f"v {p[0]} {p[1]} {p[2]}" for p in cloud]
    path.write_text("\n".join(lines) + "\n")

    config = Configuration(
        before_path=str(path),
        after_path=str(path),
        transformation_parameters=(0.2, 10.0),
        cloud_spread=10.0,
        random_seed=123,
    )
    before, after, (rot, trans) = syn.get_clouds_from_config(config)
    assert before.shape == after.shape == (200, 3)
    # determinism
    before2, after2, _ = syn.get_clouds_from_config(config)
    np.testing.assert_array_equal(before, before2)
    np.testing.assert_array_equal(after, after2)
    # oracle: after = R @ shuffled_normalized_before-like cloud + t; since
    # before/after shuffles differ, verify sets match under the transform
    recovered = (after - trans) @ rot  # R^-1 = R^T applied on the right
    b_sorted = np.sort(before.round(3), axis=0)
    r_sorted = np.sort(recovered.round(3), axis=0)
    np.testing.assert_allclose(b_sorted, r_sorted, atol=2e-3)


def test_explicit_transform_applied(tmp_path):
    cloud = (np.random.default_rng(2).random((50, 3)) * 5).astype(np.float32)
    path = tmp_path / "cloud.obj"
    path.write_text("\n".join(f"v {p[0]} {p[1]} {p[2]}" for p in cloud) + "\n")
    rot = np.eye(3, dtype=np.float32)
    config = Configuration(
        before_path=str(path),
        after_path=str(path),
        transformation=(rot, np.array([1.0, 2.0, 3.0], dtype=np.float32)),
        random_seed=7,
    )
    before, after, _ = syn.get_clouds_from_config(config)
    # identity rotation: after is a shuffle of before + t
    shifted = after - np.array([1.0, 2.0, 3.0], dtype=np.float32)
    np.testing.assert_allclose(
        np.sort(before, axis=0), np.sort(shifted, axis=0), atol=1e-5
    )


def test_empty_cloud_skips_synthesis_stages():
    """A failed load yields (0,3) clouds; spread/noise/outlier stages
    must be skipped instead of crashing on empty reductions (r2 review:
    numpy raised 'zero-size array to reduction operation' before the
    CLI's empty-cloud check could run)."""
    from tpuslam.config.configuration import Configuration
    from tpuslam.data.synthesis import get_clouds_from_config

    config = Configuration()
    config.before_path = "/nonexistent/void.obj"
    config.after_path = "/nonexistent/void.obj"
    config.random_seed = 7
    config.cloud_spread = 10.0
    config.noise_affected_points_before = 0.5
    config.noise_intensity_before = 0.1
    config.additional_outliers_before = 10
    config.transformation_parameters = (0.2, 10.0)
    before, after, (rot, t) = get_clouds_from_config(config)
    assert before.shape == (0, 3) and after.shape == (0, 3)
    assert rot.shape == (3, 3) and t.shape == (3,)
