"""Hierarchical exact NN: per-source MXU center-distance bounds, warm
upper bounds from the previous iteration, and a count-gated candidate
rescore kernel.

TPU-native acceleration of the ICP correspondence search (the
reference's ``FindCorrespondences``, ``cudacommon.cu:57-77``) that
replaces the dense O(N M) scan with a provably-exact sparse scheme built
for the *iterative* setting:

1. **Bound pass (MXU, every query).**  Targets are Morton-sorted once;
   each run of ``g`` consecutive sorted rows forms a spatially compact
   tile with a bounding sphere (center ``c_j``, radius ``r_j``).  A
   skinny-K bf16 matmul computes every source's squared distance to
   every tile center with a *rigorous* error bound: operands are split
   hi/lo in bf16 (``x = hi + lo``, all products exactly representable in
   f32), so the dropped terms are O(2^-16) relative to ``|s||c|`` —
   orders of magnitude below the tile radii the bounds already carry.
   Per-source upper bound ``ub(s) = min_j (|s - c_j| + r_j)``.

   The test is strictly PER SOURCE: bounding spheres of *source* groups
   were measured useless here — Morton runs that cross a high-bit
   octant boundary span half the cloud, and one such group admits every
   tile and forces the dense fallback for the whole call.

2. **Warm upper bound (from iteration 2 on).**  The previous
   iteration's exact NN target is still in the cloud and this source
   moved by exactly ``|Δs|``, so ``ub(s) <= sqrt(d_prev) + |Δs|`` — far
   tighter than the geometric bound once the per-iteration motion
   decays, and the reason tile culling pays on uniform clouds where
   static branch-and-bound was measured neutral.

3. **Candidate rescore (VPU).**  ``pallas_nn_cand`` — scalar-prefetch
   indirection over the per-group candidate lists (admissible tiles of
   any source in the group), per-slot compute skip from a prefetched
   count vector (dead slots repeat the last live tile id: their DMA
   dedups, their compute is skipped), exact-f32 FMA distances matching
   the jnp oracle bitwise, and the reference's first-index tie-break.

Queries whose candidate sets overflow the static budget — early
iterations with large motion — run the dense kernel instead, so the
path is exact by construction and its cost is bounded by the dense
scan's.

No reference counterpart: this is a TPU-first redesign, not a port.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpuslam.ops.spatial import morton_permutation, tile_bounds

BIG = 3.4e38
IMAX = 2**31 - 1
DEFAULT_G = 256  # target rows per candidate tile
DEFAULT_GSRC = 256  # source rows per rescore group
DEFAULT_L = 160  # candidate-tile budget (slots, multiple of 8)
# hi/lo-split matmul error: dropped terms are <= ~4*2^-16*(|s||c|+|c|^2)
# plus f32 accumulation; 8e-5 over-covers the 6.1e-5 worst case
_EPS_REL = 8e-5


class HierTarget(NamedTuple):
    """Per-registration precomputed target state (sort + bounds + MXU
    operand + packed rescore operand).  Build once; rigid motion of the
    *source* never invalidates it."""

    packed: jnp.ndarray  # f32[M, 4] — sorted (x, y, z, original index)
    original_points: jnp.ndarray  # f32[M, 3] — pre-sort order (dense path)
    count: jnp.ndarray  # i32[]
    radii: jnp.ndarray  # f32[C] — bound-tile bounding spheres (inflated)
    caug: jnp.ndarray  # bf16[12, C] — hi/lo split matmul operand
    center_ref: jnp.ndarray  # f32[3] — centering offset for the split
    cmax: jnp.ndarray  # f32[] — max |center - center_ref| over valid tiles


class HierState(NamedTuple):
    """Cross-query carry (thread through the ICP loop state)."""

    prev_dist: jnp.ndarray  # f32[N] — exact NN d^2 from previous query
    prev_pos: jnp.ndarray  # f32[N, 3]
    warm: jnp.ndarray  # bool[] — prev_dist/prev_pos are valid
    sparse: jnp.ndarray  # bool[] — last query used the sparse arm


def table_width(m: int, g: int = DEFAULT_G,
                l_budget: int = DEFAULT_L) -> int:
    """Static candidate-table width: the budget, clamped to the tile
    count and rounded up to the kernel's slots-per-step granule."""
    c = max(m // g, 1)
    return -(-min(l_budget, c) // 8) * 8


def auto_tile_params(m: int) -> Tuple[int, int, int]:
    """Size-scaled ``(g, gsrc, l_budget)``, swept on v5e
    (``tools/stage_1m.py``; VERDICT r2 #2 diagnosis).

    The admissible-tile count per source group grows with the tile
    count ``C = M/g`` — at 1.3M points the default g=256 gives C=5120
    and warm-state counts of mean 180 / max 434, overflowing the L=160
    budget EVERY iteration, so every iteration paid the ~6 s dense
    fallback.  Scaling g to hold C ~<= 1280 and widening the budget at
    large C restores the sparse arm: measured 846 ms/iter at 1.3M with
    (g=1024, gsrc=256, L=320) vs 5.8 s before — the bound pass also
    shrinks 4x (it is O(N C)).  Sweep record: L=256 saves 4% per sparse
    iteration but enters the sparse regime one ~6 s dense iteration
    later (net loss); gsrc=128 is 1.4x worse (more, smaller kernel
    launches); g=512 with L=512 spills registers in the rescore kernel.
    Small sizes keep the 100k-tuned defaults (counts mean 64 / max 129
    under L=160)."""
    g = DEFAULT_G
    while m // g > 1280:
        g *= 2
    c = max(m // g, 1)
    l_budget = DEFAULT_L if c <= 640 else 320
    return g, DEFAULT_GSRC, l_budget


def hier_state_init(n: int, m: int = 0) -> HierState:
    del m  # kept for call-site stability; state no longer depends on it
    return HierState(
        prev_dist=jnp.zeros((n,), jnp.float32),
        prev_pos=jnp.zeros((n, 3), jnp.float32),
        warm=jnp.asarray(False),
        sparse=jnp.asarray(False),
    )


def _split_hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@partial(jax.jit, static_argnames=("g",))
def prepare_hier_target(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    count: jnp.ndarray,
    g: int = DEFAULT_G,
) -> HierTarget:
    m = points.shape[0]
    assert m % g == 0, "padded target length must divide the tile size"
    # original indices ride the rescore operand as f32 (packed col 3);
    # beyond 2^24 rows adjacent indices collapse and results go silently
    # wrong — fail loudly instead
    assert m < 2**24, (
        f"hierarchical NN packs target indices as f32: {m} rows exceeds "
        "the exactly-representable 2^24 range (use the dense kernel)"
    )
    perm = morton_permutation(points, mask)
    sorted_points = points[perm]
    sorted_mask = mask[perm]
    bounds = tile_bounds(sorted_points, sorted_mask, g)
    # conservative inflation: bbox/radius arithmetic is f32
    radii = bounds.radii * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)

    valid_tile = bounds.centers[:, 0] < jnp.float32(1e14)
    lo = jnp.min(
        jnp.where(valid_tile[:, None], bounds.centers, BIG), axis=0
    )
    hi = jnp.max(
        jnp.where(valid_tile[:, None], bounds.centers, -BIG), axis=0
    )
    center_ref = jnp.where(jnp.any(valid_tile), (lo + hi) * 0.5, 0.0)

    c_rel = bounds.centers - center_ref  # sentinel tiles stay ~1e15
    c2 = jnp.sum(c_rel * c_rel, axis=-1)
    c_hi, c_lo = _split_hi_lo(c_rel)
    c2_hi, c2_lo = _split_hi_lo(c2)
    zeros = jnp.zeros_like(c2_hi)
    caug = jnp.concatenate(
        [
            c_hi.T, c_lo.T, c_hi.T,  # vs -2s_hi, -2s_hi, -2s_lo
            c2_hi[None, :], c2_lo[None, :],  # vs 1, 1
            zeros[None, :],  # pad to K=12
        ],
        axis=0,
    )
    cmax = jnp.sqrt(jnp.max(jnp.where(valid_tile, c2, 0.0)))
    # invalid rows (sorted past `count`) carry far-sentinel coordinates
    # and a BIG tie-break index, so the rescore kernel needs NO validity
    # logic at all: they can never win a (distance, index) lex-min
    row_invalid = (
        jnp.arange(m, dtype=jnp.int32)
        >= jnp.asarray(count, jnp.int32)
    )
    packed = jnp.concatenate(
        [
            jnp.where(
                row_invalid[:, None], jnp.float32(1e19), sorted_points
            ),
            jnp.where(
                row_invalid, jnp.float32(BIG), perm.astype(jnp.float32)
            )[:, None],
        ],
        axis=1,
    )
    return HierTarget(
        packed=packed,
        original_points=points,
        count=count,
        radii=radii,
        caug=caug,
        center_ref=center_ref,
        cmax=cmax,
    )


def _center_dc2(
    transformed: jnp.ndarray, target: HierTarget
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dc2 f32[N, C] approximate squared distance to each tile center,
    eps f32[] rigorous bound on its absolute error).  Downstream bounds:
    Euclidean lower bound to tile j is ``sqrt(max(dc2-eps,0)) - r_j`` and
    the upper bound through tile j is ``sqrt(dc2+eps) + r_j``."""
    s_rel = transformed - target.center_ref
    s2 = jnp.sum(s_rel * s_rel, axis=-1)  # f32, exact enough (eps covers)
    s_hi, s_lo = _split_hi_lo(s_rel)
    # scaling by -2 is exact in bf16 (power of two)
    neg2_hi = (-2.0 * s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    neg2_lo = (-2.0 * s_lo.astype(jnp.float32)).astype(jnp.bfloat16)
    ones = jnp.ones_like(s2, jnp.bfloat16)[:, None]
    saug = jnp.concatenate(
        [
            neg2_hi, neg2_hi, neg2_lo,  # vs c_hi, c_lo, c_hi
            ones, ones,  # vs c2_hi, c2_lo
            jnp.zeros_like(ones),  # pad to K=12
        ],
        axis=1,
    )
    dc2 = s2[:, None] + jnp.dot(
        saug, target.caug, preferred_element_type=jnp.float32
    )  # [N, C]
    smax = jnp.sqrt(jnp.max(s2))
    cmax = target.cmax
    eps = (
        jnp.float32(_EPS_REL)
        * (smax * cmax + cmax * cmax + smax * smax)
        + jnp.float32(1e-6)
    )
    return dc2, eps


@partial(
    jax.jit,
    static_argnames=(
        "l_budget", "g", "gsrc", "interpret", "bound_chunk_elems"
    ),
)
def nearest_neighbors_hier(
    transformed: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: HierTarget,
    state: HierState,
    l_budget: int = DEFAULT_L,
    g: int = DEFAULT_G,
    gsrc: int = DEFAULT_GSRC,
    interpret: bool = False,
    bound_chunk_elems: int = 64 * 1024 * 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray, HierState]:
    """(original-target index i32[N], squared distance f32[N], updated
    state) for each sorted source row — bit-identical to the dense
    oracle for valid sources.  ``state`` from ``hier_state_init`` on the
    first call, then threaded through (positions must be of the same
    sorted source cloud, moving rigidly between calls)."""
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    n = transformed.shape[0]
    m = target.packed.shape[0]
    c = m // g
    ts = n // gsrc
    assert n % gsrc == 0
    width = table_width(m, g, l_budget)
    l_eff = min(l_budget, c)  # overflow threshold (true budget)

    def bound_chunk(args):
        """adm_tile rows for one chunk of source groups — everything
        here is per-source-local, so the N x C distance matrix never
        materializes beyond one chunk (at 1.3M points the full dc2
        would be ~26 GB)."""
        pos, mask_c, prev_pos, prev_dist = args
        rows = pos.shape[0]
        dc2, eps = _center_dc2(pos, target)
        radii = target.radii
        ub = jnp.min(
            jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii[None, :],
            axis=1,
        )
        delta_prev = jnp.linalg.norm(pos - prev_pos, axis=-1)
        ub_warm = (
            jnp.sqrt(prev_dist) * jnp.float32(1.0 + 1e-5)
            + delta_prev
            + jnp.float32(1e-6)
        )
        ub = jnp.where(state.warm, jnp.minimum(ub, ub_warm), ub)
        ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)

        # admissible <=> sqrt(max(dc2-eps,0)) - r_j <= ub, rearranged
        # to one fused compare on dc2 (no lb materialization, no second
        # sqrt pass)
        thresh = (ub[:, None] + radii[None, :]) ** 2 + eps
        adm = jnp.logical_and(dc2 <= thresh, (mask_c > 0)[:, None])
        return jnp.any(adm.reshape(rows // gsrc, gsrc, c), axis=1)

    # chunk the bound pass so the per-chunk [rows, C] intermediates stay
    # ~<=256 MB; the [Ts, C] admissibility table itself is small
    rows_per_chunk = max(
        gsrc, (bound_chunk_elems // max(c, 1)) // gsrc * gsrc
    )
    if rows_per_chunk >= n:
        adm_tile = bound_chunk(
            (transformed, src_mask, state.prev_pos, state.prev_dist)
        )
    else:
        n_chunks = -(-n // rows_per_chunk)
        pad = n_chunks * rows_per_chunk - n

        def chunked(x):
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            return x.reshape((n_chunks, rows_per_chunk) + x.shape[1:])

        adm_tile = jax.lax.map(
            bound_chunk,
            (
                chunked(transformed),
                chunked(src_mask),  # pad rows masked -> no admissions
                chunked(state.prev_pos),
                chunked(state.prev_dist),
            ),
        ).reshape(-1, c)[:ts]
    counts = jnp.sum(adm_tile, axis=1).astype(jnp.int32)
    overflow = jnp.any(counts > l_eff)

    # admissible tile ids per group, ascending (key == tile id when
    # admissible, C when not — one sort compacts them); dead slots then
    # repeat the last live id (cummax) so their kernel DMA dedups with
    # the neighbor and their compute is count-skipped
    key = jnp.where(
        adm_tile,
        jnp.arange(c, dtype=jnp.int32)[None, :],
        jnp.int32(c),
    )
    cand = jnp.sort(key, axis=1)[:, :min(width, c)]
    cand = jnp.where(cand < c, cand, jnp.int32(-1))
    if width > c:
        cand = jnp.pad(
            cand, ((0, 0), (0, width - c)), constant_values=-1
        )
    cand = jnp.maximum(jax.lax.cummax(cand, axis=1), 0)

    def dense(_):
        idx, dist = nearest_neighbors_pallas(
            transformed, target.original_points, target.count,
            interpret=interpret,
        )
        return idx, dist, jnp.asarray(False)

    def rescore(_):
        idx, dist = nearest_neighbors_cand(
            transformed, target.packed, cand,
            jnp.minimum(counts, l_eff),
            g=g, gsrc=gsrc, interpret=interpret,
        )
        return idx, dist, jnp.asarray(True)

    idx, dist, used_sparse = jax.lax.cond(overflow, dense, rescore, None)
    # no-match contract: both arms normalize to the jnp oracle's
    # (idx=0, dist=BIG) in their wrappers; re-assert it here so the
    # contract holds even if a future kernel change regresses it —
    # downstream index arithmetic (e.g. the sharded global-index
    # offset) relies on idx staying in range
    idx = jnp.where(dist >= jnp.float32(BIG), 0, idx)
    return idx, dist, HierState(
        prev_dist=dist,
        prev_pos=transformed,
        warm=jnp.asarray(True),
        sparse=used_sparse,
    )
