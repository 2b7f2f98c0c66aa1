"""Hierarchical NN (MXU center bounds + cached candidate tables +
certificate) vs the dense oracle: exact distance AND index parity is
required — the bound construction must provably never drop a true
nearest neighbor, across rebuilds, cached-table hits, and certificate
failures alike."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuslam.core.types import pad_cloud
from tpuslam.ops.nn import nearest_neighbors_ref
from tpuslam.ops.nn_hier import (
    hier_state_init,
    nearest_neighbors_hier,
    prepare_hier_target,
)
from tpuslam.ops.spatial import morton_permutation


def _sorted_sources(src):
    mask = jnp.ones((src.shape[0],), jnp.float32)
    perm = morton_permutation(jnp.asarray(src), mask)
    return jnp.asarray(src)[perm], mask


@pytest.mark.parametrize("n,m,count", [
    (1024, 2048, 2048),
    (2048, 2048, 1800),
    (1024, 4096, 4096),
])
def test_hier_matches_dense(rng, n, m, count):
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt_full = (rng.random((m, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud(tgt_full[:count], multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n, m)

    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(dist_h), np.asarray(dist_ref)
    )


def test_hier_cached_table_stays_exact(rng):
    """Drift the sources over several small rigid steps: cached-table
    hits (certificate ok) and rebuilds must all stay bit-identical."""
    from tests.conftest import random_rigid

    n, m = 1024, 2048
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n, m)

    pos = np.asarray(src_sorted)
    table_hits = 0
    for step in range(5):
        moved = jnp.asarray(pos)
        idx_h, dist_h, state = nearest_neighbors_hier(
            moved, mask_s, target, state, interpret=True
        )
        idx_ref, dist_ref = nearest_neighbors_ref(
            moved, tgt.points, tgt.count
        )
        np.testing.assert_array_equal(
            np.asarray(idx_h), np.asarray(idx_ref), err_msg=f"step {step}"
        )
        np.testing.assert_array_equal(
            np.asarray(dist_h), np.asarray(dist_ref),
            err_msg=f"step {step}",
        )
        table_hits += int(np.asarray(state.table_valid))
        r, t = random_rigid(rng, angle=0.01, trans=0.02)
        pos = (pos @ r.T + t).astype(np.float32)
    assert table_hits >= 1  # the cached path must actually engage


def test_hier_large_jump_forces_rebuild_and_stays_exact(rng):
    """A huge displacement after a build must fail the certificate (or
    overflow) and still return oracle-exact results."""
    n = m = 1024
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n, m)
    _, _, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    jumped = src_sorted + jnp.asarray([7.0, -3.0, 5.0])
    idx_h, dist_h, state = nearest_neighbors_hier(
        jumped, mask_s, target, state, interpret=True
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        jumped, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(dist_h), np.asarray(dist_ref)
    )


def test_hier_tiny_budget_overflows_to_dense(rng):
    """A candidate budget of 8 of 16 tiles overflows on almost any
    data; the dense arm must produce identical results."""
    n, m = 1024, 4096
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n, m, l_budget=8)
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, l_budget=8, interpret=True
    )
    assert not bool(np.asarray(state.table_valid))
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_ref))


def test_hier_near_tie_cases(rng):
    """Adversarial near-ties: clustered duplicate-ish targets so that the
    argmin is decided by the exact FMA formulation and the first-index
    tie-break, not by the approximate bound pass.  Includes EXACT
    duplicates, which exercise the original-index tie-break."""
    n, m = 1024, 4096
    base = (rng.random((n, 3)) * 4.0).astype(np.float32)
    tgt = np.concatenate([
        base + np.float32(1e-4) * rng.standard_normal((n, 3)).astype(
            np.float32),
        base + np.float32(1e-4) * rng.standard_normal((n, 3)).astype(
            np.float32),
        base,  # exact duplicates of the sources...
        base,  # ...twice: ties decided by original index
    ])
    tgt = pad_cloud(tgt.astype(np.float32), multiple=m)
    src_sorted, mask_s = _sorted_sources(base)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n, m)
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    idx_ref, dist_ref = nearest_neighbors_ref(
        src_sorted, tgt.points, tgt.count
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_ref))
    np.testing.assert_array_equal(
        np.asarray(dist_h), np.asarray(dist_ref)
    )


def test_icp_hier_matches_dense_path(rng):
    from tpuslam.algorithms.icp import icp_register
    from tests.conftest import random_rigid

    before = (rng.random((1500, 3)) * 10).astype(np.float32)
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
