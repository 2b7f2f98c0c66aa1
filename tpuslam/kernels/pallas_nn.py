"""Pallas TPU kernel: blocked nearest-neighbor (min, argmin) search.

The TPU-native replacement for the reference's ``FindCorrespondences`` CUDA
kernel (one thread per source point serially scanning all M targets,
``cudacommon.cu:57-77``): a 2-D grid over (source tiles x target tiles);
each step evaluates a ``[BM, BN]`` squared-distance tile and folds a
running (min, argmin) accumulator held in the lane-aligned ``[1, N]``
output refs across target tiles.

Layout rules (measured 4x on v5e):

* targets ride the sublanes (their per-source reduction is a cheap
  sublane min) and sources the lanes;
* each operand enters in the layout whose coordinate slices are free —
  targets as ``[M, 3]`` (``t[:, c:c+1]`` is a sublane vector) and sources
  TRANSPOSED as ``[3, N]`` (``sT[c:c+1, :]`` is a lane vector).  Slicing a
  lane-axis column out of an ``[N, 3]`` block and rebroadcasting it across
  lanes forces a relayout every tile and dominates the kernel (~8x
  overhead measured).

Numerics: distances use the exact-f32 per-coordinate FMA form.  The
algebraic ``|t|^2+|s|^2-2ts`` shortcut would ride the MXU but cancels
catastrophically — NN distances sit far below the norms, and the MXU's
bf16-pass products swamp them (measured: argmin agreement 8% at 131k
points, spread 10).

Tie-breaking matches the reference's strict ``<`` scan
(``common.cpp:416``): within a tile the emulated argmin keeps the lowest
target row; across tiles a strictly-smaller distance is required to
replace the incumbent, so earlier (lower-index) tiles win ties.

Invalid target rows (index >= count, including internal padding) are
pushed to a far sentinel coordinate by the wrapper; their distances
(~3e38) exceed any real distance, and the wrapper maps them back to the
exact BIG no-match value of the jnp oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpuslam.core.types import pick_block, round_up

BIG = 3.4e38  # Python literals: jnp scalars would be captured consts
IMAX = 2**31 - 1
# invalid-target sentinel: d^2 against it is ~3e38 (or +inf after
# rounding), far above any real distance; the wrapper maps every
# sentinel-range distance back to the oracle's exact BIG no-match value
SENTINEL = 1e19
_SENTINEL_DIST = 1e37  # any distance this large can only be a sentinel

# internal padding granule; [BM, BN] f32 tile + argmin temporaries at
# 2048x1024 measured best on v5e within the VMEM budget
_TILE = 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_count: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Same contract as ``tpuslam.ops.nn.nearest_neighbors_ref``:
    (i32[N] index of nearest valid target, f32[N] squared distance).
    Any row counts accepted — inputs are padded internally to tile
    multiples and outputs sliced back to the input length.

    Delegates to the batched kernel with B=1 (the grid gains a unit
    leading dim, which lowers identically), so the solo and vmapped
    paths can never drift."""
    idx, dist = nearest_neighbors_pallas_batch(
        src[None],
        tgt[None],
        jnp.reshape(jnp.asarray(tgt_count, jnp.int32), (1,)),
        interpret=interpret,
    )
    return idx[0], dist[0]


def _nn_kernel_batch(srcT_ref, tgt_ref, dist_ref, idx_ref):
    j = pl.program_id(2)
    bm = tgt_ref.shape[1]
    bn = srcT_ref.shape[2]

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    sT = srcT_ref[0]  # [3, BN] — sources on lanes
    t = tgt_ref[0]  # [BM, 3] — targets on sublanes
    # invalid target rows carry the caller's far sentinel, so their d
    # overflows past any real distance — no per-tile validity select
    d = (t[:, 0:1] - sT[0:1, :]) ** 2
    d += (t[:, 1:2] - sT[1:2, :]) ** 2
    d += (t[:, 2:3] - sT[2:3, :]) ** 2

    tile_min = jnp.min(d, axis=0, keepdims=True)  # [1, BN]
    # first-occurrence argmin emulated with a row-index min
    rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    masked_rows = jnp.where(d == tile_min, rows, IMAX)
    tile_arg = jnp.min(masked_rows, axis=0, keepdims=True) + j * bm

    better = tile_min < dist_ref[0]
    dist_ref[0] = jnp.where(better, tile_min, dist_ref[0])
    idx_ref[0] = jnp.where(better, tile_arg, idx_ref[0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas_batch(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_count: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched variant: ``src`` f32[B, N, 3], ``tgt`` f32[B, M, 3],
    ``tgt_count`` i32[B] — one 3-D-grid kernel launch for all B pairs
    (BASELINE's batched multi-pair regime; the reference has no batch
    notion at all).  The unbatched entry is this kernel at B=1."""
    b, n0 = src.shape[0], src.shape[1]
    m0 = tgt.shape[1]
    # pad internally to large-tile multiples: lane-multiple-only shapes
    # (e.g. 50048) would otherwise fall to 128x128 tiles and a grid with
    # ~64x more steps; extra target rows sit beyond ``count`` and are
    # masked, extra source rows are sliced off the outputs
    n = round_up(n0, _TILE)
    m = round_up(m0, _TILE)
    if n != n0:
        src = jnp.pad(src, ((0, 0), (0, n - n0), (0, 0)))
    if m != m0:
        tgt = jnp.pad(tgt, ((0, 0), (0, m - m0), (0, 0)))
    # n, m are _TILE multiples, so these resolve to 2048/1024-grade tiles
    # whose product stays within the VMEM budget by construction
    bn = pick_block(n, (2048, 1024))
    bm = pick_block(m, (1024,))
    # push invalid rows (>= count, including internal padding) to the far
    # sentinel once, instead of a validity select in every kernel tile
    row_invalid = (
        jnp.arange(m, dtype=jnp.int32)[None, :]
        >= jnp.asarray(tgt_count, jnp.int32)[:, None]
    )
    tgt = jnp.where(row_invalid[:, :, None], SENTINEL, tgt)

    grid = (b, n // bn, m // bm)
    dist, idx = pl.pallas_call(
        _nn_kernel_batch,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3, bn), lambda p, i, j: (p, 0, i)),
                pl.BlockSpec((1, bm, 3), lambda p, i, j: (p, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, bn), lambda p, i, j: (p, 0, i)),
                pl.BlockSpec((1, 1, bn), lambda p, i, j: (p, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=13 * b * n * m,
            bytes_accessed=b * (n * 3 + m * 3 + 2 * n) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.swapaxes(src, 1, 2), tgt)
    # sentinel rows report astronomical "distances" (~3e38, or inf when
    # the arithmetic saturates — input-dependent); map the whole sentinel
    # range back to the oracle's exact BIG, and the winning sentinel-row
    # index back to the oracle's 0, so the no-match contract
    # (idx=0, dist=BIG) is identical across backends
    dist = dist.reshape(b, n)
    no_match = dist >= _SENTINEL_DIST
    dist = jnp.where(no_match, BIG, dist)
    idx = jnp.where(no_match, 0, idx.reshape(b, n))
    return idx[:, :n0], dist[:, :n0]
