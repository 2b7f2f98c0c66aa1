"""Spatial (Morton + branch-and-bound) NN path vs the dense oracle:
exact distance AND index parity is required — the candidate construction
must provably never drop a true nearest neighbor."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuslam.core.types import pad_cloud
from tpuslam.ops.nn import nearest_neighbors_ref
from tpuslam.ops.nn_spatial import nearest_neighbors_spatial, prepare_target
from tpuslam.ops.spatial import (
    morton_codes,
    morton_permutation,
    select_candidates,
    tile_bounds,
)


def numpy_morton(q):
    def spread(x):
        out = 0
        for b in range(10):
            out |= ((x >> b) & 1) << (3 * b)
        return out

    return spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2)


def test_morton_codes_match_bit_oracle(rng):
    pts = (rng.random((256, 3)) * 7.0 - 2.0).astype(np.float32)
    mask = np.ones(256, np.float32)
    codes = np.asarray(morton_codes(jnp.asarray(pts), jnp.asarray(mask)))
    lo, hi = pts.min(0), pts.max(0)
    q = np.clip(
        ((pts - lo) / np.maximum(hi - lo, 1e-12) * 1023.0).astype(np.int64),
        0, 1023,
    )
    want = np.array([numpy_morton(row) for row in q])
    np.testing.assert_array_equal(codes, want)


def test_morton_sorts_invalid_rows_last(rng):
    pts = (rng.random((256, 3))).astype(np.float32)
    mask = np.ones(256, np.float32)
    mask[100:] = 0.0
    perm = np.asarray(
        morton_permutation(jnp.asarray(pts), jnp.asarray(mask))
    )
    assert set(perm[100:]) == set(range(100, 256))


def test_tile_bounds_cover(rng):
    pts = (rng.random((512, 3)) * 5.0).astype(np.float32)
    mask = np.ones(512, np.float32)
    perm = np.asarray(morton_permutation(jnp.asarray(pts), jnp.asarray(mask)))
    sp = pts[perm]
    b = tile_bounds(jnp.asarray(sp), jnp.asarray(mask), 128)
    centers, radii = np.asarray(b.centers), np.asarray(b.radii)
    for t in range(4):
        tile = sp[t * 128:(t + 1) * 128]
        d = np.linalg.norm(tile - centers[t], axis=1)
        assert d.max() <= radii[t] + 1e-5


def test_candidates_contain_true_nn_tile(rng):
    n, m, bn, bm = 512, 1024, 128, 128
    src = (rng.random((n, 3)) * 8.0).astype(np.float32)
    tgt = (rng.random((m, 3)) * 8.0).astype(np.float32)
    ones = np.ones
    perm_s = np.asarray(morton_permutation(jnp.asarray(src),
                                           jnp.asarray(ones(n, np.float32))))
    perm_t = np.asarray(morton_permutation(jnp.asarray(tgt),
                                           jnp.asarray(ones(m, np.float32))))
    ss, ts = src[perm_s], tgt[perm_t]
    sb = tile_bounds(jnp.asarray(ss), jnp.asarray(ones(n, np.float32)), bn)
    tb = tile_bounds(jnp.asarray(ts), jnp.asarray(ones(m, np.float32)), bm)
    cand, overflow = select_candidates(sb, tb, max_candidates=m // bm)
    assert not bool(overflow)
    cand = np.asarray(cand)
    # brute force: the tile holding each source point's true NN must be in
    # that source tile's candidate list
    d = ((ss[:, None, :] - ts[None, :, :]) ** 2).sum(-1)
    nn_tile = d.argmin(1) // bm
    for i in range(n):
        assert nn_tile[i] in cand[i // bn], (i, nn_tile[i], cand[i // bn])


@pytest.mark.parametrize("n,m,count", [
    (1024, 1024, 1024),
    (2048, 1536, 1400),
    (1024, 2048, 2048),
])
def test_spatial_matches_dense(rng, n, m, count):
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt_full = (rng.random((m, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud(tgt_full[:count], multiple=m)

    mask_s = jnp.ones((n,), jnp.float32)
    perm_s = morton_permutation(jnp.asarray(src), mask_s)
    src_sorted = jnp.asarray(src)[perm_s]

    target = prepare_target(
        tgt.points, tgt.mask(), tgt.count, bm=256
    )
    idx_sp, dist_sp = nearest_neighbors_spatial(
        src_sorted, mask_s, target, bn=256, bm=256, max_candidates=8,
        interpret=True,
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_sp), np.asarray(idx_ref))
    np.testing.assert_allclose(
        np.asarray(dist_sp), np.asarray(dist_ref), rtol=1e-6, atol=1e-6
    )


def test_spatial_overflow_falls_back_dense(rng):
    # max_candidates=1 forces overflow on almost any data -> dense path
    n = m = 512
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    mask_s = jnp.ones((n,), jnp.float32)
    perm_s = morton_permutation(jnp.asarray(src), mask_s)
    src_sorted = jnp.asarray(src)[perm_s]
    target = prepare_target(tgt.points, tgt.mask(), tgt.count, bm=128)
    idx_sp, dist_sp = nearest_neighbors_spatial(
        src_sorted, mask_s, target, bn=128, bm=128, max_candidates=1,
        interpret=True,
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_sp), np.asarray(idx_ref))


def test_icp_spatial_matches_dense_path(rng):
    from tpuslam.algorithms.icp import icp_register

    before = (rng.random((1500, 3)) * 10).astype(np.float32)
    from tests.conftest import random_rigid

    r, t = random_rigid(rng, angle=0.2, trans=1.0)
    after = (before @ r.T + t)[rng.permutation(1500)].astype(np.float32)
    dense = icp_register(
        pad_cloud(before), pad_cloud(after),
        max_iterations=25, use_spatial=False,
    )
    spatial = icp_register(
        pad_cloud(before), pad_cloud(after),
        max_iterations=25, use_spatial=True,
    )
    assert int(spatial.iterations) == int(dense.iterations)
    np.testing.assert_allclose(
        np.asarray(spatial.transform.rotation),
        np.asarray(dense.transform.rotation),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(spatial.transform.translation),
        np.asarray(dense.transform.translation),
        atol=1e-4,
    )
    assert float(spatial.error) == pytest.approx(
        float(dense.error), rel=1e-3, abs=1e-6
    )


def test_padded_source_tiles_do_not_trip_overflow():
    # ADVICE r1: a fully-padded source tile carries the sentinel far
    # center; in f32 its distances to every target tile round identically,
    # so every tile looked admissible and the overflow flag silently
    # forced the dense fallback.  Padded tiles must count zero.
    n, m, bn, bm = 512, 512, 128, 128
    # 2 valid source tiles clustered at the origin; 2 padded tiles.
    src_padded = np.zeros((n, 3), np.float32)
    src_padded[:256] = np.linspace(0, 0.1, 256 * 3).reshape(256, 3)
    mask_s = np.zeros(n, np.float32)
    mask_s[:256] = 1.0
    # target: tile 0 near the origin, tiles 1-3 far away in distinct spots
    tgt = np.zeros((m, 3), np.float32)
    tgt[:128] = np.linspace(0, 0.1, 128 * 3).reshape(128, 3)
    for t in range(1, 4):
        tgt[t * 128:(t + 1) * 128] = (
            np.linspace(0, 0.1, 128 * 3).reshape(128, 3) + 100.0 * t
        )
    sb = tile_bounds(jnp.asarray(src_padded), jnp.asarray(mask_s), bn)
    tb = tile_bounds(jnp.asarray(tgt), jnp.asarray(np.ones(m, np.float32)),
                     bm)
    # each valid source tile admits only target tile 0; before the fix the
    # two padded tiles admitted all 4 tiles and tripped the overflow.
    cand, overflow = select_candidates(sb, tb, max_candidates=2)
    assert not bool(overflow)
    cand = np.asarray(cand)
    assert cand[0, 0] == 0 and cand[1, 0] == 0


def test_warm_candidates_match_dense(rng):
    """Warm-start admissibility: previous exact NN distances + per-point
    displacement give a proven upper bound; the sparse result must stay
    bit-identical to the dense oracle after the sources move."""
    n, m = 1024, 2048
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    mask_s = jnp.ones((n,), jnp.float32)
    perm_s = morton_permutation(jnp.asarray(src), mask_s)
    src_sorted = jnp.asarray(src)[perm_s]
    target = prepare_target(tgt.points, tgt.mask(), tgt.count, bm=256)

    _, dist0 = nearest_neighbors_ref(src_sorted, tgt.points, tgt.count)

    # a small rigid step, as between ICP iterations
    from tests.conftest import random_rigid

    r, t = random_rigid(rng, angle=0.02, trans=0.05)
    moved = (np.asarray(src_sorted) @ r.T + t).astype(np.float32)
    delta = jnp.linalg.norm(jnp.asarray(moved) - src_sorted, axis=-1)

    idx_sp, dist_sp = nearest_neighbors_spatial(
        jnp.asarray(moved), mask_s, target, bn=256, bm=256,
        max_candidates=8, interpret=True, warm=(dist0, delta),
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        jnp.asarray(moved), tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_sp), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(dist_sp), np.asarray(dist_ref)
    )


def test_warm_large_motion_overflows_to_dense(rng):
    """A huge displacement makes every tile admissible; the warm path
    must overflow the candidate budget and take the dense kernel."""
    n = m = 512
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    mask_s = jnp.ones((n,), jnp.float32)
    perm_s = morton_permutation(jnp.asarray(src), mask_s)
    src_sorted = jnp.asarray(src)[perm_s]
    target = prepare_target(tgt.points, tgt.mask(), tgt.count, bm=128)
    _, dist0 = nearest_neighbors_ref(src_sorted, tgt.points, tgt.count)
    delta = jnp.full((n,), 50.0, jnp.float32)
    idx_sp, dist_sp = nearest_neighbors_spatial(
        src_sorted, mask_s, target, bn=128, bm=128,
        max_candidates=1, interpret=True, warm=(dist0, delta),
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_sp), np.asarray(idx_ref))
