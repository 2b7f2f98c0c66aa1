"""Spatial sorting and tile culling for the sparse NN fast path.

The dense NN kernel scans every (source tile x target tile) pair — O(N M)
distance work.  Sorting both clouds along a Morton (Z-order) curve makes
index-contiguous tiles spatially compact, so per-tile bounding spheres
give a branch-and-bound guarantee: for source tile i with upper bound
``ub_i = min_j (|c_i - c_j| + r_i + r_j)^2`` on its worst NN distance,
every tile that can contain a nearest neighbor satisfies
``lb(i,j) = max(0, |c_i - c_j| - r_i - r_j)^2 <= ub_i``.  Only those
candidate tiles are evaluated — typically a handful out of hundreds.

Crucial invariant: rigid transforms preserve distances, so a cloud sorted
ONCE by its initial Morton order keeps its tiles compact through every
ICP iteration — no re-sorting in the loop (the bounds are recomputed from
the transformed points each iteration; that is O(N), not O(N M)).

This has no counterpart in the reference (its CUDA kernel is a dense
serial scan, ``cudacommon.cu:57-77``); it is a TPU-side algorithmic
improvement that preserves exact results: candidate sets provably contain
the true nearest neighbor, and the kernel's (distance, original-index)
lexicographic combine reproduces the reference's first-index tie-break.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

IMAX = 2**31 - 1


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of ``x`` so consecutive bits land 3 apart
    (the classic Morton magic-number sequence)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_codes(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """i32[N] Z-order codes over a 1024^3 grid spanning the valid bbox;
    invalid rows get INT32_MAX so they sort to the end."""
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(mask[:, None] > 0, points, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None] > 0, points, -big), axis=0)
    extent = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(
        ((points - lo) / extent * 1023.0).astype(jnp.int32), 0, 1023
    )
    code = (
        _part1by2(q[:, 0])
        | (_part1by2(q[:, 1]) << 1)
        | (_part1by2(q[:, 2]) << 2)
    )
    return jnp.where(mask > 0, code, IMAX)


def morton_permutation(
    points: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """i32[N] permutation sorting rows by Morton code (stable — equal
    codes keep original order; invalid rows go last)."""
    return jnp.argsort(
        morton_codes(points, mask), stable=True
    ).astype(jnp.int32)


class TileBounds(NamedTuple):
    centers: jnp.ndarray  # f32[T, 3]
    radii: jnp.ndarray  # f32[T] — bounding-sphere radius (to bbox corner)


def tile_bounds(
    sorted_points: jnp.ndarray, sorted_mask: jnp.ndarray, tile: int
) -> TileBounds:
    """Bounding sphere of each index-contiguous tile of a sorted cloud.
    Fully-invalid tiles get +inf radius-style exclusion via a far center
    and zero radius (their lb is huge, so they are never candidates)."""
    t = sorted_points.shape[0] // tile
    pts = sorted_points.reshape(t, tile, 3)
    msk = sorted_mask.reshape(t, tile)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(msk[:, :, None] > 0, pts, big), axis=1)
    hi = jnp.max(jnp.where(msk[:, :, None] > 0, pts, -big), axis=1)
    any_valid = jnp.sum(msk, axis=1) > 0
    center = jnp.where(
        any_valid[:, None], (lo + hi) * 0.5, jnp.float32(1e15)
    )
    radius = jnp.where(
        any_valid,
        0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=-1)),
        0.0,
    )
    return TileBounds(centers=center, radii=radius)


def _tile_pair_lb(
    src_bounds: TileBounds, tgt_bounds: TileBounds
) -> jnp.ndarray:
    """f32[T_s, T_t] lower bound on the squared distance between any
    point of source tile i and any point of target tile j (bounding
    spheres), deflated by an f32-safety factor so rounding can never make
    the bound optimistic."""
    dc = jnp.linalg.norm(
        src_bounds.centers[:, None, :] - tgt_bounds.centers[None, :, :],
        axis=-1,
    )  # [T_s, T_t]
    rsum = src_bounds.radii[:, None] + tgt_bounds.radii[None, :]
    lb = jnp.maximum(dc - rsum, 0.0) ** 2
    return lb * jnp.float32(1.0 - 1e-5)


def _compact_admissible(
    lb: jnp.ndarray,
    admissible: jnp.ndarray,
    src_valid: jnp.ndarray,
    max_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared tail of candidate selection: per-row top-``max_candidates``
    admissible tiles ordered by ``lb`` (padded with -1), plus the
    all-rows overflow flag (invalid source rows never count)."""
    counts = jnp.where(src_valid, jnp.sum(admissible, axis=1), 0)
    overflowed = jnp.any(counts > max_candidates)
    order_key = jnp.where(admissible, lb, jnp.float32(3.4e38))
    idx_sorted = jnp.argsort(order_key, axis=1)[:, :max_candidates]
    take_valid = (
        jnp.sort(order_key, axis=1)[:, :max_candidates] < 3.4e38
    )
    candidates = jnp.where(take_valid, idx_sorted, -1).astype(jnp.int32)
    return candidates, overflowed


def select_candidates(
    src_bounds: TileBounds,
    tgt_bounds: TileBounds,
    max_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each source tile, the target tiles that may contain a nearest
    neighbor, padded to ``max_candidates`` with -1.

    Returns (candidates i32[T_s, L], overflowed bool[] — True if any tile
    had more admissible candidates than L, in which case the caller must
    fall back to the dense scan to stay exact)."""
    lb = _tile_pair_lb(src_bounds, tgt_bounds)
    dc = jnp.linalg.norm(
        src_bounds.centers[:, None, :] - tgt_bounds.centers[None, :, :],
        axis=-1,
    )
    rsum = src_bounds.radii[:, None] + tgt_bounds.radii[None, :]
    ub = (dc + rsum) ** 2
    ub_best = jnp.min(ub, axis=1, keepdims=True)  # [T_s, 1]
    admissible = lb <= ub_best
    # Fully-padded source tiles carry the sentinel far center (1e15); in
    # f32 their distances to every target tile round identically, making
    # every tile "admissible".  Their outputs are masked anyway, so they
    # must not trip the overflow fallback to the dense scan.
    src_valid = src_bounds.centers[:, 0] < jnp.float32(1e14)
    return _compact_admissible(lb, admissible, src_valid, max_candidates)


def select_candidates_warm(
    src_bounds: TileBounds,
    tgt_bounds: TileBounds,
    ub_tile: jnp.ndarray,
    max_candidates: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warm-started candidate selection: ``ub_tile`` f32[T_s] is a proven
    upper bound on the worst NN squared distance of any valid source in
    each tile (e.g. from the previous ICP iteration's exact NN distances
    inflated by the per-point displacement).  Admits every target tile
    whose bounding-sphere lower bound can beat it — a far tighter test
    than the geometric ``(dc + rsum)^2`` upper bound when the transform
    step is small.  Exact: the true NN tile of every source satisfies
    ``lb <= d_true <= ub_tile``.  No reference counterpart (the CUDA
    kernel is a dense serial scan, ``cudacommon.cu:57-77``)."""
    lb = _tile_pair_lb(src_bounds, tgt_bounds)
    admissible = lb <= ub_tile[:, None]
    src_valid = src_bounds.centers[:, 0] < jnp.float32(1e14)
    return _compact_admissible(lb, admissible, src_valid, max_candidates)
