"""Spatial sorting and tile bounds — the substrate of the hierarchical
exact NN (``tpuslam.ops.nn_hier``).

Sorting a cloud along a Morton (Z-order) curve makes index-contiguous
tiles spatially compact, so each run of ``g`` sorted rows gets a tight
bounding sphere.  ``nn_hier`` builds its per-source admissibility bounds
from these tiles (MXU center distances + radii); the admissibility test
itself lives there — per-source, not per-source-tile, because Morton
runs that cross a high-bit octant boundary span half the cloud and one
such *source* group would admit every target tile.

Crucial invariant: rigid transforms preserve distances, so a cloud sorted
ONCE by its initial Morton order keeps its tiles compact through every
ICP iteration — no re-sorting in the loop (the bounds are recomputed from
the transformed points each iteration; that is O(N), not O(N M)).

This has no counterpart in the reference (its CUDA kernel is a dense
serial scan, ``cudacommon.cu:57-77``); it is part of a TPU-side
algorithmic improvement that preserves exact results.
"""

from __future__ import annotations

from typing import NamedTuple

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


def host_morton_order(points, n_valid: int):
    """Host-side (NumPy) replica of ``morton_codes`` + stable argsort,
    invalid/padded rows last.  Performance-only: sorted order feeds tile
    compactness / candidate-block locality; every consumer's results are
    exact for ANY row order, so host/device float quirks cannot change
    results.  A NumPy argsort at 376k costs ~30 ms where the TPU sort
    costs ~0.4 s and, unlike the device sort, runs off the accelerator's
    critical path (used by the scanned sequence lowering and the chunked
    CPD driver's pre-sort)."""
    import numpy as np

    n = len(points)
    # 30-bit codes fit int32; int32 throughout roughly halves the
    # bit-twiddling and sort cost vs int64 on the host
    codes = np.full(n, np.int32(2**31 - 1), dtype=np.int32)
    if n_valid > 0:
        pts = np.asarray(points[:n_valid], np.float32)
        lo = pts.min(axis=0)
        extent = np.maximum(pts.max(axis=0) - lo, 1e-12)
        q = np.clip(
            ((pts - lo) * (np.float32(1023.0) / extent)).astype(np.int32),
            0, 1023,
        )

        def part1by2(x):
            x = x & np.int32(0x3FF)
            x = (x | (x << 16)) & np.int32(0x030000FF)
            x = (x | (x << 8)) & np.int32(0x0300F00F)
            x = (x | (x << 4)) & np.int32(0x030C30C3)
            x = (x | (x << 2)) & np.int32(0x09249249)
            return x

        codes[:n_valid] = (
            part1by2(q[:, 0])
            | (part1by2(q[:, 1]) << 1)
            | (part1by2(q[:, 2]) << 2)
        )
    return np.argsort(codes, kind="stable")


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
