"""Pallas TPU kernel: spatially-culled nearest-neighbor search.

The sparse companion of ``pallas_nn``: both clouds are Morton-sorted
(``tpuslam.ops.spatial``), and each source tile only scans its admissible
candidate target tiles (branch-and-bound over tile bounding spheres).
The grid is (source tiles x L candidate slots); the candidate table is a
scalar-prefetch operand, so the target-tile BlockSpec index map reads it
to DMA exactly the tiles that matter — dead slots (-1) skip all compute.

Exactness: the candidate sets provably contain every possible nearest
neighbor (``select_candidates``), and the running combine is
lexicographic on (distance, ORIGINAL index) — strictly smaller distance
wins, equal distance falls to the smaller original target index — which
reproduces the reference's first-index-wins tie-break
(``common.cpp:416``) regardless of the spatial visit order.  Distances
use the same exact-f32 per-coordinate FMA form as the dense kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.4e38
IMAX = 2**31 - 1


def _nn_sparse_kernel(
    count_ref, cand_ref, safe_ref, srcT_ref, tgt_ref, orig_ref,
    dist_ref, idx_ref,
):
    i = pl.program_id(0)
    slot = pl.program_id(1)
    bm = tgt_ref.shape[0]
    bn = srcT_ref.shape[1]
    cand = cand_ref[i, slot]

    @pl.when(slot == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, BIG)
        idx_ref[:] = jnp.full_like(idx_ref, IMAX)

    @pl.when(cand >= 0)
    def _():
        sT = srcT_ref[:]  # [3, BN] — sorted sources on lanes
        t = tgt_ref[:]  # [BM, 3] — sorted targets on sublanes
        d = (t[:, 0:1] - sT[0:1, :]) ** 2
        d += (t[:, 1:2] - sT[1:2, :]) ** 2
        d += (t[:, 2:3] - sT[2:3, :]) ** 2

        # sorted-space validity: padded rows sort to the end
        valid = (
            cand * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
        ) < count_ref[0]
        d = jnp.where(valid, d, BIG)

        tile_min = jnp.min(d, axis=0, keepdims=True)  # [1, BN]
        # argmin carries the ORIGINAL target index (reference tie-break)
        orig = orig_ref[:]  # [BM, 1] i32
        masked = jnp.where(d == tile_min, orig, IMAX)
        tile_arg = jnp.min(masked, axis=0, keepdims=True)

        better = jnp.logical_or(
            tile_min < dist_ref[:],
            jnp.logical_and(
                tile_min == dist_ref[:], tile_arg < idx_ref[:]
            ),
        )
        dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
        idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])


@functools.partial(
    jax.jit, static_argnames=("bn", "bm", "interpret")
)
def nearest_neighbors_sparse(
    src_sorted: jnp.ndarray,
    tgt_sorted: jnp.ndarray,
    tgt_orig_idx: jnp.ndarray,
    tgt_count: jnp.ndarray,
    candidates: jnp.ndarray,
    bn: int = 1024,
    bm: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``src_sorted`` f32[N,3] / ``tgt_sorted`` f32[M,3]: Morton-sorted
    clouds; ``tgt_orig_idx`` i32[M]: sorted row -> original row;
    ``candidates`` i32[N//bn, L] from ``select_candidates`` (slot -1 =
    dead).  Returns per SORTED source row: (original target index i32[N],
    squared distance f32[N])."""
    n, m = src_sorted.shape[0], tgt_sorted.shape[0]
    assert n % bn == 0 and m % bm == 0
    t_s, l_slots = candidates.shape
    assert t_s == n // bn
    count = jnp.asarray(tgt_count, jnp.int32).reshape(1)
    safe_cand = jnp.maximum(candidates, 0)  # valid DMA index for dead slots

    dist, idx = pl.pallas_call(
        _nn_sparse_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(t_s, l_slots),
            in_specs=[
                pl.BlockSpec((3, bn), lambda i, l, c, cr, cs: (0, i)),
                pl.BlockSpec(
                    (bm, 3), lambda i, l, c, cr, cs: (cs[i, l], 0)
                ),
                pl.BlockSpec(
                    (bm, 1), lambda i, l, c, cr, cs: (cs[i, l], 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, bn), lambda i, l, c, cr, cs: (0, i)),
                pl.BlockSpec((1, bn), lambda i, l, c, cr, cs: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
        interpret=interpret,
    )(count, candidates, safe_cand, src_sorted.T, tgt_sorted,
      tgt_orig_idx.reshape(m, 1))
    return idx.reshape(n), dist.reshape(n)
