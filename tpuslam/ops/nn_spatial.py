"""Spatially-culled NN orchestration: Morton sort + tile bounds +
candidate selection + sparse kernel, with a provably-exact dense fallback.

See ``tpuslam.ops.spatial`` for the branch-and-bound construction and
``tpuslam.kernels.pallas_nn_sparse`` for the kernel.  The intended usage
pattern (ICP) sorts both clouds ONCE per registration — rigid motion
preserves tile compactness — and re-derives only the cheap O(T^2)
candidate table per iteration.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpuslam.ops.spatial import (
    TileBounds,
    morton_permutation,
    select_candidates,
    select_candidates_warm,
    tile_bounds,
)

DEFAULT_BN = 1024
DEFAULT_BM = 512
DEFAULT_L = 32


def pick_blocks(n: int, m: int):
    """Largest hardware-friendly tile sizes dividing the padded shapes."""
    def pick(v, prefer):
        for b in prefer:
            if v % b == 0:
                return b
        return v

    return (
        pick(n, (DEFAULT_BN, 512, 256, 128)),
        pick(m, (DEFAULT_BM, 256, 128)),
    )


class SpatialTarget(NamedTuple):
    """Per-registration precomputed target state."""

    sorted_points: jnp.ndarray  # f32[M, 3]
    original_points: jnp.ndarray  # f32[M, 3] — pre-sort order (dense path)
    orig_idx: jnp.ndarray  # i32[M] — sorted row -> original row
    count: jnp.ndarray  # i32[]
    bounds: TileBounds  # per-tile bounding spheres


def prepare_target(
    points: jnp.ndarray, mask: jnp.ndarray, count: jnp.ndarray,
    bm: int | None = None,
) -> SpatialTarget:
    if bm is None:
        bm = pick_blocks(points.shape[0], points.shape[0])[1]
    perm = morton_permutation(points, mask)
    sorted_points = points[perm]
    sorted_mask = mask[perm]
    return SpatialTarget(
        sorted_points=sorted_points,
        original_points=points,
        orig_idx=perm,
        count=count,
        bounds=tile_bounds(sorted_points, sorted_mask, bm),
    )


def nearest_neighbors_spatial(
    src_sorted: jnp.ndarray,
    src_mask_sorted: jnp.ndarray,
    target: SpatialTarget,
    bn: int | None = None,
    bm: int | None = None,
    max_candidates: int = DEFAULT_L,
    interpret: bool | None = None,
    warm: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(original-target index i32[N], squared distance f32[N]) per sorted
    source row.  Falls back to the dense kernel when any source tile's
    admissible candidate set exceeds ``max_candidates`` (exactness first).

    ``warm``: optional ``(prev_dist f32[N], delta f32[N])`` — each
    source's exact NN squared distance from the previous query and the
    Euclidean displacement of the source since then.  Enables the
    warm-start admissibility test (``select_candidates_warm``), which is
    dramatically tighter than the geometric bound once the motion per
    iteration shrinks; early large-motion iterations overflow the
    candidate budget and transparently take the dense kernel instead.
    """
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas
    from tpuslam.kernels.pallas_nn_sparse import nearest_neighbors_sparse

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    auto_bn, auto_bm = pick_blocks(
        src_sorted.shape[0], target.sorted_points.shape[0]
    )
    bn = bn or auto_bn
    bm = bm or auto_bm
    assert target.bounds.radii.shape[0] == (
        target.sorted_points.shape[0] // bm
    ), "prepare_target bm must match nearest_neighbors_spatial bm"
    src_bounds = tile_bounds(src_sorted, src_mask_sorted, bn)
    if warm is None:
        candidates, overflowed = select_candidates(
            src_bounds, target.bounds, max_candidates
        )
    else:
        prev_dist, delta = warm
        # proven per-source bound on the NEW NN squared distance: the
        # previous iteration's exact NN target is still there, and this
        # source moved by exactly |delta|, so
        # d_new <= (sqrt(d_prev) + delta)^2.  Inflated for f32 safety;
        # invalid sources are excluded from the tile max.
        ub_point = (jnp.sqrt(prev_dist) + delta) ** 2
        ub_point = ub_point * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
        ub_point = jnp.where(src_mask_sorted > 0, ub_point, 0.0)
        ub_tile = jnp.max(ub_point.reshape(-1, bn), axis=1)
        candidates, overflowed = select_candidates_warm(
            src_bounds, target.bounds, ub_tile, max_candidates
        )

    def sparse_path(_):
        return nearest_neighbors_sparse(
            src_sorted, target.sorted_points, target.orig_idx,
            target.count, candidates, bn=bn, bm=bm, interpret=interpret,
        )

    def dense_path(_):
        # dense scan over the ORIGINAL target order: identical distances
        # and reference tie-breaking without an index remap
        return nearest_neighbors_pallas(
            src_sorted, target.original_points, target.count,
            interpret=interpret,
        )

    return jax.lax.cond(overflowed, dense_path, sparse_path, None)
