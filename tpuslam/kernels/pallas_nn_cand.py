"""Pallas TPU kernel: exact NN rescore over a candidate-tile table.

Companion of ``tpuslam.ops.nn_hier``: each group of ``gsrc`` sorted
sources carries a compacted list of admissible target tiles (``g``
sorted rows each) plus its live-slot count.  Both are scalar-prefetch
operands: the table drives the target-tile BlockSpec index map (only
tiles that matter are DMA'd), the count gates per-slot compute.

Design points (each measured on v5e):

* **Count-gated slots.**  The admissible-tile count varies per source
  group while the table width is static; computing every slot wasted
  ~3x of the kernel at the measured steady-state occupancy (~52 live of
  160 slots).  Dead slots repeat the last live tile id (filled at build
  time), so their DMA dedups with the neighboring step, and a scalar
  ``pl.when`` on the prefetched count skips their compute entirely.
* **No validity logic in the fold.**  Rows past the target count carry
  far-sentinel coordinates and a BIG tie-break index straight from
  ``prepare_hier_target``, so they never win; the inner loop is pure
  distance + fold.
* **Packed operand.**  The target is a ``[M, 4]`` array of
  ``(x, y, z, original_index_as_f32)``.  The HBM row-tile layout pads
  the minor dimension to 128 lanes either way, so the 4th column rides
  the same DMA for free — folding the tie-break index without a second
  (equally padded, equally sized) index operand halves DMA traffic.
  Original indices are exact in f32 below 2^24 rows.
* **Several slots per grid step** through per-slot BlockSpecs — fewer,
  fatter grid steps than one tile per step (the per-step overhead at
  fine tile granularity dominated otherwise).

Exactness: distances use the exact-f32 per-coordinate FMA form (the
formulation is the contract — it matches the jnp oracle bitwise), and
the running combine is lexicographic on (distance, ORIGINAL index),
which reproduces the reference's first-index-wins tie-break
(``common.cpp:416``) regardless of the spatial visit order.
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
SLOTS_PER_STEP = 8
# scalar-prefetch operands live in SMEM (1 MB/core); cap the candidate
# table [groups, width] i32 at ~512 KB per launch and lax.map over
# source segments beyond it (width-aware: wide budgets at the 1M+
# rungs shrink the per-launch group count)
_TABLE_SMEM_BYTES = 512 * 1024


def max_table_groups(width: int) -> int:
    return max(1, _TABLE_SMEM_BYTES // (max(width, 1) * 4))


def _make_kernel(slots: int):
    def kernel(counts_ref, cand_ref, srcT_ref, *refs):
        del cand_ref
        t_refs = refs[:slots]
        dist_ref, idx_ref = refs[slots:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, BIG)
            idx_ref[:] = jnp.full_like(idx_ref, BIG)

        live = counts_ref[i] - j * slots
        sT = srcT_ref[:]  # [3, GSRC] — sources on lanes
        for r in range(slots):
            @pl.when(r < live)
            def _(r=r):
                t = t_refs[r][:]  # [g, 4] — (x, y, z, orig idx) sublanes
                d = (t[:, 0:1] - sT[0:1, :]) ** 2
                d += (t[:, 1:2] - sT[1:2, :]) ** 2
                d += (t[:, 2:3] - sT[2:3, :]) ** 2

                tile_min = jnp.min(d, axis=0, keepdims=True)  # [1, GSRC]
                masked = jnp.where(d == tile_min, t[:, 3:4], BIG)
                tile_arg = jnp.min(masked, axis=0, keepdims=True)

                better = jnp.logical_or(
                    tile_min < dist_ref[:],
                    jnp.logical_and(
                        tile_min == dist_ref[:], tile_arg < idx_ref[:]
                    ),
                )
                dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
                idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("g", "gsrc", "slots", "interpret")
)
def nearest_neighbors_cand(
    src_sorted: jnp.ndarray,
    tgt_packed: jnp.ndarray,
    candidates: jnp.ndarray,
    counts: jnp.ndarray,
    g: int = 256,
    gsrc: int = 256,
    slots: int = SLOTS_PER_STEP,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``tgt_packed`` f32[M, 4]: Morton-sorted target rows as
    ``(x, y, z, original_index)``, invalid rows pre-sentineled;
    ``candidates`` i32[N//gsrc, L] of target-tile ids (compacted
    ascending, dead slots filled with the last live id; L divisible by
    ``slots``); ``counts`` i32[N//gsrc] live slots per group.  Returns
    per SORTED source row (original target index i32[N], squared
    distance f32[N]); rows with no admissible candidate report the
    oracle's exact (idx=0, dist=BIG) no-match contract."""
    n, m = src_sorted.shape[0], tgt_packed.shape[0]
    assert n % gsrc == 0 and m % g == 0
    ts, l_slots = candidates.shape
    assert ts == n // gsrc and l_slots % slots == 0
    assert counts.shape == (ts,)
    s = slots

    if ts > max_table_groups(l_slots):
        # segment the source axis so each launch's SMEM table fits;
        # padded segments carry zero live slots (no compute, outputs
        # fall through to the no-match contract and are sliced off)
        seg = max_table_groups(l_slots)
        n_segs = -(-ts // seg)
        pad_g = n_segs * seg - ts
        src_t = jnp.pad(
            src_sorted, ((0, pad_g * gsrc), (0, 0))
        ).reshape(n_segs, seg * gsrc, 3)
        cand_t = jnp.pad(candidates, ((0, pad_g), (0, 0))).reshape(
            n_segs, seg, l_slots
        )
        counts_t = jnp.pad(counts, (0, pad_g)).reshape(n_segs, seg)

        def one(args):
            src_s, cand_s, counts_s = args
            return nearest_neighbors_cand(
                src_s, tgt_packed, cand_s, counts_s,
                g=g, gsrc=gsrc, slots=slots, interpret=interpret,
            )

        idx_t, dist_t = jax.lax.map(one, (src_t, cand_t, counts_t))
        return idx_t.reshape(-1)[:n], dist_t.reshape(-1)[:n]

    def t_spec(r):
        return pl.BlockSpec(
            (g, 4),
            lambda i, j, ct, cr, r=r: (cr[i, j * s + r], 0),
        )

    dist, idxf = pl.pallas_call(
        _make_kernel(s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts, l_slots // s),
            in_specs=[
                pl.BlockSpec((3, gsrc), lambda i, j, ct, cr: (0, i)),
                *[t_spec(r) for r in range(s)],
            ],
            out_specs=[
                pl.BlockSpec((1, gsrc), lambda i, j, ct, cr: (0, i)),
                pl.BlockSpec((1, gsrc), lambda i, j, ct, cr: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(counts, candidates, src_sorted.T, *([tgt_packed] * s))
    dist = dist.reshape(n)
    idxf = idxf.reshape(n)
    # sentinel rows report astronomical distances; map the whole range
    # back to the jnp oracle's exact (idx=0, dist=BIG) no-match contract
    # (shared with pallas_nn) so downstream index arithmetic stays safe
    no_match = dist >= jnp.float32(1e37)
    dist = jnp.where(no_match, BIG, dist)
    idx = jnp.where(no_match, 0, idxf.astype(jnp.int32))
    return idx, dist


def _make_kernel_batch(slots: int):
    def kernel(counts_ref, cand_ref, srcT_ref, *refs):
        del cand_ref
        t_refs = refs[:slots]
        dist_ref, idx_ref = refs[slots:]
        p = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, BIG)
            idx_ref[:] = jnp.full_like(idx_ref, BIG)

        live = counts_ref[p, i] - j * slots
        sT = srcT_ref[0]  # [3, GSRC]
        for r in range(slots):
            @pl.when(r < live)
            def _(r=r):
                t = t_refs[r][0]  # [g, 4]
                d = (t[:, 0:1] - sT[0:1, :]) ** 2
                d += (t[:, 1:2] - sT[1:2, :]) ** 2
                d += (t[:, 2:3] - sT[2:3, :]) ** 2

                tile_min = jnp.min(d, axis=0, keepdims=True)
                masked = jnp.where(d == tile_min, t[:, 3:4], BIG)
                tile_arg = jnp.min(masked, axis=0, keepdims=True)

                better = jnp.logical_or(
                    tile_min < dist_ref[0],
                    jnp.logical_and(
                        tile_min == dist_ref[0], tile_arg < idx_ref[0]
                    ),
                )
                dist_ref[0] = jnp.where(better, tile_min, dist_ref[0])
                idx_ref[0] = jnp.where(better, tile_arg, idx_ref[0])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("g", "gsrc", "slots", "interpret")
)
def nearest_neighbors_cand_batch(
    src_sorted: jnp.ndarray,
    tgt_packed: jnp.ndarray,
    candidates: jnp.ndarray,
    counts: jnp.ndarray,
    g: int = 256,
    gsrc: int = 256,
    slots: int = SLOTS_PER_STEP,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched candidate rescore: one (B, groups, slot-steps) grid for
    all B pairs (the multi-pair regime; same contract per pair as
    ``nearest_neighbors_cand``).  ``src_sorted`` f32[B, N, 3],
    ``tgt_packed`` f32[B, M, 4], ``candidates`` i32[B, ts, L],
    ``counts`` i32[B, ts]."""
    b, n = src_sorted.shape[0], src_sorted.shape[1]
    m = tgt_packed.shape[1]
    assert n % gsrc == 0 and m % g == 0
    _, ts, l_slots = candidates.shape
    assert ts == n // gsrc and l_slots % slots == 0
    assert counts.shape == (b, ts)
    s = slots

    if b * ts > max_table_groups(l_slots):
        # segment over the batch so the SMEM table fits; each pair is
        # independent, so halving recursively is exact
        half = b // 2
        if half == 0:  # a single pair that still overflows: delegate
            idx, dist = nearest_neighbors_cand(
                src_sorted[0], tgt_packed[0], candidates[0], counts[0],
                g=g, gsrc=gsrc, slots=slots, interpret=interpret,
            )
            return idx[None], dist[None]
        ia, da = nearest_neighbors_cand_batch(
            src_sorted[:half], tgt_packed[:half], candidates[:half],
            counts[:half], g=g, gsrc=gsrc, slots=slots,
            interpret=interpret,
        )
        ib, db = nearest_neighbors_cand_batch(
            src_sorted[half:], tgt_packed[half:], candidates[half:],
            counts[half:], g=g, gsrc=gsrc, slots=slots,
            interpret=interpret,
        )
        return (
            jnp.concatenate([ia, ib], 0), jnp.concatenate([da, db], 0)
        )

    def t_spec(r):
        return pl.BlockSpec(
            (1, g, 4),
            lambda p, i, j, ct, cr, r=r: (p, cr[p, i, j * s + r], 0),
        )

    dist, idxf = pl.pallas_call(
        _make_kernel_batch(s),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, ts, l_slots // s),
            in_specs=[
                pl.BlockSpec((1, 3, gsrc), lambda p, i, j, ct, cr: (p, 0, i)),
                *[t_spec(r) for r in range(s)],
            ],
            out_specs=[
                pl.BlockSpec((1, 1, gsrc), lambda p, i, j, ct, cr: (p, 0, i)),
                pl.BlockSpec((1, 1, gsrc), lambda p, i, j, ct, cr: (p, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(counts, candidates, jnp.swapaxes(src_sorted, 1, 2), *([tgt_packed] * s))
    dist = dist.reshape(b, n)
    idxf = idxf.reshape(b, n)
    no_match = dist >= jnp.float32(1e37)
    dist = jnp.where(no_match, BIG, dist)
    idx = jnp.where(no_match, 0, idxf.astype(jnp.int32))
    return idx, dist
