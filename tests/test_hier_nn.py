"""Warm-start hierarchical NN (group-sphere bounds + candidate rescore)
vs the dense oracle: exact distance AND index parity is required — the
bound construction must provably never drop a true nearest neighbor,
across cold starts, warm sparse queries, and overflow fallbacks alike."""

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


def _assert_oracle(idx_h, dist_h, moved, tgt, msg=""):
    idx_ref, dist_ref = nearest_neighbors_ref(moved, tgt.points, tgt.count)
    np.testing.assert_array_equal(
        np.asarray(idx_h), np.asarray(idx_ref), err_msg=msg
    )
    np.testing.assert_array_equal(
        np.asarray(dist_h), np.asarray(dist_ref), err_msg=msg
    )


@pytest.mark.parametrize("n,m,count", [
    (1024, 2048, 2048),
    (2048, 2048, 1800),
    (1024, 4096, 4096),
])
def test_hier_matches_dense(rng, n, m, count):
    """Cold start (dense arm) and a warm sparse query both match the
    oracle bitwise."""
    from tests.conftest import random_rigid

    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt_full = (rng.random((m, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud(tgt_full[:count], multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)

    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    # cold start may take either arm (geometric bound only); exactness
    # is the contract either way
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "cold")

    r, t = random_rigid(rng, angle=0.02, trans=0.05)
    moved = jnp.asarray(
        (np.asarray(src_sorted) @ r.T + t).astype(np.float32)
    )
    idx_h, dist_h, state = nearest_neighbors_hier(
        moved, mask_s, target, state, interpret=True
    )
    _assert_oracle(idx_h, dist_h, moved, tgt, "warm")


def test_hier_warm_drift_stays_exact(rng):
    """Drift the sources over several small rigid steps: every warm
    query must stay bit-identical, and the sparse arm must actually
    engage (that is the whole point of the path)."""
    from tests.conftest import random_rigid

    n, m = 1024, 2048
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)

    pos = np.asarray(src_sorted)
    sparse_hits = 0
    for step in range(5):
        moved = jnp.asarray(pos)
        idx_h, dist_h, state = nearest_neighbors_hier(
            moved, mask_s, target, state, interpret=True
        )
        _assert_oracle(idx_h, dist_h, moved, tgt, f"step {step}")
        sparse_hits += int(np.asarray(state.sparse))
        r, t = random_rigid(rng, angle=0.01, trans=0.02)
        pos = (pos @ r.T + t).astype(np.float32)
    assert sparse_hits >= 3  # steps 1.. should all take the sparse arm


def test_hier_large_jump_overflows_and_stays_exact(rng):
    """A huge displacement blows up the warm bound, overflows the
    candidate budget, and must still return oracle-exact results via
    the dense fallback."""
    n = m = 4096
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)
    _, _, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, l_budget=8, interpret=True
    )
    jumped = src_sorted + jnp.asarray([7.0, -3.0, 5.0])
    idx_h, dist_h, state = nearest_neighbors_hier(
        jumped, mask_s, target, state, l_budget=8, interpret=True
    )
    assert not bool(np.asarray(state.sparse))  # overflowed to dense
    _assert_oracle(idx_h, dist_h, jumped, tgt, "jump")


def test_hier_near_tie_cases(rng):
    """Adversarial near-ties: clustered duplicate-ish targets so that
    the argmin is decided by the exact FMA formulation and the
    first-index tie-break, not by the bounds.  Includes EXACT
    duplicates, which exercise the original-index tie-break, queried
    through the warm sparse arm with zero motion (distance exactly
    equal to the warm bound's core)."""
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
    state = hier_state_init(n)
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "cold")
    # zero-motion warm query: ub == d_prev exactly; ties must survive
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    assert bool(np.asarray(state.sparse))
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "warm ties")


def test_hier_padded_target_rows_never_win(rng):
    """Targets padded far past `count`: sentinel rows must never be
    reported, in either arm."""
    n, m, count = 1024, 4096, 1100
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt_full = (rng.random((m, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud(tgt_full[:count], multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "cold")
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    assert bool(np.asarray(state.sparse))
    assert int(np.asarray(idx_h).max()) < count
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "warm")


def test_cand_kernel_segments_large_tables(rng, monkeypatch):
    """Candidate tables beyond the SMEM cap are segmented over source
    groups (lax.map) — results must be identical to the unsegmented
    call.  Guards the >=275k regime where the [groups, width] prefetch
    operand exceeded the 1 MB SMEM and killed the ladder run."""
    import tpuslam.kernels.pallas_nn_cand as cand_mod

    # ts = 8 groups; cap 3 forces 3 segments with a padded tail.  The
    # cap is read at TRACE time, so patch before any call and drop any
    # cached trace of these shapes from earlier tests.
    monkeypatch.setattr(cand_mod, "max_table_groups", lambda width: 3)
    nearest_neighbors_hier.clear_cache()
    cand_mod.nearest_neighbors_cand.clear_cache()

    n, m = 2048, 4096
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)
    _, _, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    assert bool(np.asarray(state.sparse))
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "segmented")
    nearest_neighbors_hier.clear_cache()
    cand_mod.nearest_neighbors_cand.clear_cache()


def test_hier_chunked_bound_pass_stays_exact(rng):
    """Force the bound pass down the lax.map chunked branch (tiny
    element budget): results must stay bit-identical to the oracle and
    the sparse arm must still engage on the warm query.  Guards the
    1.3M-point regime where the full [N, C] center-distance matrix
    cannot be materialized."""
    n, m = 2048, 4096
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count)
    state = hier_state_init(n)
    # c = 16 tiles; budget 4096 elems -> 256 rows/chunk -> 8 chunks
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True,
        bound_chunk_elems=4096,
    )
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "cold chunked")
    idx_h, dist_h, state = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True,
        bound_chunk_elems=4096,
    )
    assert bool(np.asarray(state.sparse))
    _assert_oracle(idx_h, dist_h, src_sorted, tgt, "warm chunked")
    # chunked and unchunked admissibility must agree exactly
    idx_u, dist_u, _ = nearest_neighbors_hier(
        src_sorted, mask_s, target, state, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx_h), np.asarray(idx_u))


@pytest.mark.parametrize("n", [1500, 1900])
def test_icp_hier_matches_dense_path(rng, n):
    """n=1500 pads to 1536 (256-aligned); n=1900 pads to 1920, which is
    128- but NOT 256-aligned — icp_register must re-pad internally for
    the hier path's 256-row groups (regression: sizes like 20000 hit an
    assert)."""
    from tpuslam.algorithms.icp import icp_register
    from tests.conftest import random_rigid

    before = (rng.random((n, 3)) * 10).astype(np.float32)
    r, t = random_rigid(rng, angle=0.2, trans=1.0)
    after = (before @ r.T + t)[rng.permutation(n)].astype(np.float32)
    dense = icp_register(
        pad_cloud(before), pad_cloud(after),
        max_iterations=25, use_spatial=False,
    )
    spatial = icp_register(
        pad_cloud(before), pad_cloud(after),
        max_iterations=25, use_spatial=True,
    )
    # per-query NN results are bit-exact, but the Morton re-ordering of
    # the sources changes Procrustes summation ORDER, so trajectories may
    # drift at float-noise level over 25 iterations
    assert abs(int(spatial.iterations) - int(dense.iterations)) <= 2
    np.testing.assert_allclose(
        np.asarray(spatial.transform.rotation),
        np.asarray(dense.transform.rotation),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(spatial.transform.translation),
        np.asarray(dense.transform.translation),
        atol=1e-2,
    )


def test_auto_tile_params_scaling():
    # size-scaled parameters (swept on v5e, tools/stage_1m.py): g holds
    # the tile count C <= 1280, the budget widens at large C — at 1M+
    # the old fixed (256, 256, 160) overflowed every warm iteration and
    # fell back to the ~6 s dense scan (VERDICT r2 #2)
    from tpuslam.ops.nn_hier import (
        DEFAULT_G, DEFAULT_GSRC, DEFAULT_L, auto_tile_params,
    )

    assert auto_tile_params(102_400) == (DEFAULT_G, DEFAULT_GSRC, DEFAULT_L)
    g, gsrc, l = auto_tile_params(1_310_720)
    assert g == 512 and gsrc == 512 and l == 512
    assert 1_310_720 // g <= 2560
    g2, _, _ = auto_tile_params(655_360)
    assert 655_360 // g2 <= 2560
    # tiny clouds never shrink below the defaults
    assert auto_tile_params(512) == (DEFAULT_G, DEFAULT_GSRC, DEFAULT_L)


def test_coarse_middle_arm_exact(rng):
    """Whatever arm a budget routes to — fine, coarse, or dense — the
    result must stay bit-identical to the oracle: coarse admission is a
    superset of fine admission, never a different answer."""
    n, m = 2048, 8192  # g=128 -> C=64; g2=512 -> C2=16 (>= 8, arm live)
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt_pts = (rng.random((m, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud(tgt_pts, multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count, g=128)

    # a warm state whose bound is ~1 unit: point each source at an
    # arbitrary real target row at most ~sqrt(300) away — rigor of the
    # bound is what matters, not tightness
    state = hier_state_init(n)._replace(
        prev_target=jnp.broadcast_to(tgt.points[0], (n, 3)),
        warm=jnp.asarray(True),
    )
    for l_budget in (8, 24, 1000):
        idx_h, dist_h, st = nearest_neighbors_hier(
            src_sorted, mask_s, target, state,
            l_budget=l_budget, g=128, gsrc=1024, interpret=True,
        )
        _assert_oracle(idx_h, dist_h, src_sorted, tgt,
                       msg=f"l_budget={l_budget}")


def test_coarse_middle_arm_routing(rng, monkeypatch):
    """Routing: fine counts over budget but coarse counts under it must
    take the COARSE arm (g2-tile coverage), tiny fine counts the fine
    arm, and coarse-overflow the dense kernel.  The bound pass is
    stubbed with crafted admissibility; each arm covers a DIFFERENT row
    set by construction, so the returned distances identify which arm
    executed (lax.cond traces every branch — call counts cannot).
    Real-bound exactness is covered by test_coarse_middle_arm_exact."""
    import tpuslam.kernels.pallas_bound as bound_mod

    n, m = 2048, 8192
    g, gsrc, L = 128, 1024, 8  # C=64, g2=512, C2=16, l_eff2=min(8,10)=8
    c, ts = m // g, n // gsrc
    src = (rng.random((n, 3)) * 10.0).astype(np.float32)
    tgt = pad_cloud((rng.random((m, 3)) * 10.0).astype(np.float32),
                    multiple=m)
    src_sorted, mask_s = _sorted_sources(src)
    target = prepare_hier_target(tgt.points, tgt.mask(), tgt.count, g=g)

    crafted = {}

    def fake_bound(saug, aux, caug, radii, eps, warm, gsrc, interpret):
        return jnp.asarray(crafted["adm"])

    monkeypatch.setattr(bound_mod, "bound_pass_pallas", fake_bound)
    nearest_neighbors_hier.clear_cache()
    state = hier_state_init(n)
    packed = np.asarray(target.packed)
    moved = np.asarray(src_sorted)

    def brute_over_rows(rows):
        pts = packed[rows, :3]
        idxs = packed[rows, 3]
        d = ((moved[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        best = d.argmin(axis=1)
        return idxs[best].astype(np.int32), d[np.arange(n), best]

    def run():
        idx, dist, st = nearest_neighbors_hier(
            src_sorted, mask_s, target, state,
            l_budget=L, g=g, gsrc=gsrc, interpret=True,
        )
        return np.asarray(idx), np.asarray(dist), st

    def fine_rows(tiles):
        return np.concatenate([np.arange(t * g, (t + 1) * g) for t in tiles])

    # window 1: 4 SCATTERED fine tiles -> fine arm; the coarse arm would
    # cover 4x these rows, so matching the 4-tile brute force pins it
    adm = np.zeros((ts, c), bool)
    adm[:, [0, 8, 16, 24]] = True
    crafted["adm"] = adm
    idx, dist, st = run()
    e_idx, e_dist = brute_over_rows(fine_rows([0, 8, 16, 24]))
    np.testing.assert_array_equal(idx, e_idx)
    # numpy reduces in a different order than the kernel's FMA form
    np.testing.assert_allclose(dist, e_dist, rtol=3e-7, atol=0)
    assert bool(st.sparse)

    # window 2: 20 contiguous fine tiles (5 coarse) -> coarse arm; the
    # fine arm truncated at 8 tiles would cover 1024 rows, dense all m
    nearest_neighbors_hier.clear_cache()
    adm = np.zeros((ts, c), bool)
    adm[:, :20] = True
    crafted["adm"] = adm
    idx, dist, st = run()
    e_idx, e_dist = brute_over_rows(np.arange(20 * g))
    np.testing.assert_array_equal(idx, e_idx)
    np.testing.assert_allclose(dist, e_dist, rtol=3e-7, atol=0)
    assert bool(st.sparse)

    # window 3: 40 fine tiles = 10 coarse (> l_eff2) -> dense full scan
    nearest_neighbors_hier.clear_cache()
    adm = np.zeros((ts, c), bool)
    adm[:, :40] = True
    crafted["adm"] = adm
    idx, dist, st = run()
    _assert_oracle(idx, dist, src_sorted, tgt, msg="dense window")
    assert not bool(st.sparse)
    nearest_neighbors_hier.clear_cache()
