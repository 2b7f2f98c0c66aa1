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

2. **Warm upper bound (from iteration 1 on).**  The previous
   iteration's exact NN target point ``y_prev`` is still in the cloud,
   so ``ub(s) <= |s_new - y_prev|`` — computed EXACTLY at the new
   position (one O(N) norm), not via the triangle inequality
   ``sqrt(d_prev) + |Δs|`` that round 3 used.  The direct form is
   pointwise tighter always, and drastically so right after a large
   Procrustes step: the step moves each source TOWARD its matched
   target (Procrustes minimizes exactly ``Σ|s_new - y_prev|²``), so
   ``|s_new - y_prev|`` collapses to the post-step residual while
   ``|Δs|`` is the full step length.  This is what lets the sparse arm
   engage from iteration 1 of a cold start instead of iteration ~3
   (measured: the round-3 bound overflowed iterations 1-2 to the dense
   kernel at 100k, ~25% of a 50-iteration run's wall).

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

from functools import lru_cache, partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from tpuslam.ops.spatial import morton_permutation, tile_bounds

BIG = 3.4e38
IMAX = 2**31 - 1
DEFAULT_G = 128  # target rows per candidate tile
DEFAULT_GSRC = 1024  # source rows per rescore group (see auto_tile_params)
DEFAULT_L = 192  # candidate-tile budget (slots, multiple of 8)
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

    # the previous query's matched target point (a REAL cloud point, so
    # the distance to it at any later source position is a rigorous NN
    # upper bound)
    prev_target: jnp.ndarray  # f32[N, 3]
    warm: jnp.ndarray  # bool[] — prev_target is valid
    sparse: jnp.ndarray  # bool[] — last query used the sparse arm


def table_width(m: int, g: int = DEFAULT_G,
                l_budget: int = DEFAULT_L) -> int:
    """Static candidate-table width: the budget, clamped to the tile
    count and rounded up to the kernel's slots-per-step granule."""
    c = max(m // g, 1)
    return -(-min(l_budget, c) // 8) * 8


def auto_tile_params(m: int) -> Tuple[int, int, int]:
    """Size-scaled ``(g, gsrc, l_budget)``, swept on v5e
    (``tools/stage_1m.py`` for the 1M regime, VERDICT r2 #2 diagnosis;
    ``tools/probe_rescore.py`` for the rescore-kernel structure,
    round 3).

    ``g`` / ``l_budget``: the admissible-tile count per source group
    grows with the tile count ``C = M/g`` — at 1.3M points a fixed
    g=256 gives C=5120 and warm-state counts of mean ~200 / max ~470,
    overflowing small budgets EVERY iteration, so every iteration paid
    the ~6 s dense fallback (the round-2 diagnosis).  Scaling g to hold
    C ~<= 2560 and widening the budget with C keeps the sparse arm
    live: at 1.3M, (g=512, gsrc=512, L=512) measured 434 ms/iter vs
    604 at (1024, 512, 320) and 846 at the round-2 (1024, 256, 320) —
    finer tiles admit ~26% fewer ROWS, and the budget still clears the
    warm count distribution (mean 150 / p99 274 / max 365 vs 512).
    The bound pass is O(N C), so C is capped where its growth would eat
    the rescore gain.

    ``gsrc``: the rescore kernel's cost at steady state is dominated by
    GRID-STEP machinery, not distance FLOPs — at 100k the round-2
    (gsrc=256, L=160) table ran 8000 steps of which ~70% were dead
    (count-gated) yet still paid ~0.6 us each, capping the kernel at
    1.5 Tops/s vs the dense kernel's 3.2.  Widening the source group
    cuts steps proportionally and widens the VPU tiles; with the fused
    bound-pass kernel (kernels/pallas_bound.py) the finer g=128 tiles
    became affordable too (admitted ROWS shrink ~2x even though tile
    counts grow), and (g=128, gsrc=1024, L=256) measured 5.1 ms rescore
    vs the round-2 9.2 — 118 vs 80 ICP it/s end to end at 100k.
    gsrc=128 is 1.4x worse than 256; the VMEM ceiling binds gsrc at
    large g (slot buffers + [g, gsrc] temporaries: g=1024 with
    gsrc=1024 exceeds the 16 MB scoped limit), hence the g-conditional
    clamp.
    """
    g = 128
    while m // g > 2560:
        g *= 2
    c = max(m // g, 1)
    # round 5 (de-aliased fixture, end-to-end sweep
    # bench_results/sweep_e2e_r5.log / sweep192_r5.log): L=192 measures
    # 186.8 vs 182.9 it/s at L=256 on the 100k headline (steady-state
    # counts mean 59 / max 121 fit comfortably; fewer count-gated grid
    # steps win) and is neutral on the uniform worst case (140.0 vs
    # 140.6); L=160 gains ~0.4% more on the model cloud but costs 2.3%
    # on uniform, so 192 is the balanced pick.
    l_budget = 192 if c <= 1280 else 512
    gsrc = 1024 if g <= 256 else 512
    return g, gsrc, l_budget


def hier_state_init(n: int, m: int = 0) -> HierState:
    del m  # kept for call-site stability; state no longer depends on it
    return HierState(
        prev_target=jnp.zeros((n, 3), jnp.float32),
        warm=jnp.asarray(False),
        sparse=jnp.asarray(False),
    )


def _split_hi_lo(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@partial(jax.jit, static_argnames=("g", "presorted"))
def prepare_hier_target(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    count: jnp.ndarray,
    g: int = DEFAULT_G,
    presorted: bool = False,
) -> HierTarget:
    """``presorted=True`` skips the in-program Morton argsort (the
    scanned sequence lowering sorts every cloud ONCE on the host and
    shares the order between its source and target roles); the caller
    must supply rows already in Morton order with invalid rows LAST.
    The packed tie-break index is then the row position in the sorted
    array, so exact-distance ties resolve in sorted order rather than
    the caller's original order (still deterministic; returned indices
    and ``original_points`` gathers live in the same sorted space)."""
    m = points.shape[0]
    assert m % g == 0, "padded target length must divide the tile size"
    # original indices ride the rescore operand as f32 (packed col 3);
    # beyond 2^24 rows adjacent indices collapse and results go silently
    # wrong — fail loudly instead
    assert m < 2**24, (
        f"hierarchical NN packs target indices as f32: {m} rows exceeds "
        "the exactly-representable 2^24 range (use the dense kernel)"
    )
    if presorted:
        perm = jnp.arange(m, dtype=jnp.int32)
        sorted_points = points
        sorted_mask = mask
    else:
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


def _coarse_tile_rows(g: int, gsrc: int) -> int:
    """Tile rows of the coarse middle arm (0 = no coarse arm).  The
    rescore kernel's VMEM per step is ~``8*g2*512 + 3*g2*gsrc*4`` bytes
    (slot buffers + [g2, gsrc] temporaries), which binds g2 at 512 for
    gsrc=1024 and 1024 for gsrc=512 within the 16 MB scoped limit."""
    g2 = 512 if gsrc >= 1024 else 1024
    return g2 if g2 > g else 0


def _build_cand_table(
    adm: jnp.ndarray, counts: jnp.ndarray, width: int
) -> jnp.ndarray:
    """Admissible tile ids per group, ascending, compacted left WITHOUT
    a sort: slot k's id is the rank count ``sum_j 1[cumsum(adm)_j <= k]``
    (the position of the (k+1)-th set bit — cumsum increments exactly at
    admissible tiles).  XLA's TPU sort at [Ts, C] measured ~4.4 ms per
    100k dispatch (tools/stage_100k.py); the comparison-sum is pure VPU
    elementwise work, chunked over groups so the [chunk, C, width]
    intermediate stays ~<=64M elements.  Dead slots (k >= count) then
    repeat the last live id (cummax) so their kernel DMA dedups with the
    neighbor and their compute is count-skipped."""
    ts, c = adm.shape
    cum = jnp.cumsum(adm.astype(jnp.int32), axis=1)  # [Ts, C]
    slots = jnp.arange(width, dtype=jnp.int32)

    def rank_chunk(cum_chunk):
        return jnp.sum(
            (cum_chunk[:, :, None] <= slots[None, None, :]).astype(
                jnp.int32
            ),
            axis=1,
        )

    groups_per_chunk = max(1, (64 * 1024 * 1024) // max(c * width, 1))
    if groups_per_chunk >= ts:
        cand = rank_chunk(cum)
    else:
        n_tc = -(-ts // groups_per_chunk)
        pad_g = n_tc * groups_per_chunk - ts
        cand = jax.lax.map(
            rank_chunk,
            jnp.pad(cum, ((0, pad_g), (0, 0))).reshape(
                n_tc, groups_per_chunk, c
            ),
        ).reshape(-1, width)[:ts]
    cand = jnp.where(slots[None, :] < jnp.minimum(counts, width)[:, None],
                     cand, jnp.int32(-1))
    return jnp.maximum(jax.lax.cummax(cand, axis=1), 0)


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
    from tpuslam.kernels.pallas_bound import bound_pass_pallas
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    del bound_chunk_elems  # kept for call-site stability (pre-r3 knob)
    n = transformed.shape[0]
    m = target.packed.shape[0]
    c = m // g
    if n < gsrc:  # small direct calls: one group is the whole cloud
        gsrc = n
    ts = n // gsrc
    assert n % gsrc == 0
    width = table_width(m, g, l_budget)
    l_eff = min(l_budget, c)  # overflow threshold (true budget)

    # bound pass: the fused Pallas kernel (see kernels/pallas_bound.py)
    # — the [N, C] distance matrix lives only in VMEM, one group block
    # at a time (the jnp formulation paid ~4-6 HBM passes over it,
    # ~2.1 ms/iter at 100k, and needed explicit chunking at 1.3M where
    # the full dc2 would be ~26 GB).  Cheap [N]-sized prep stays in
    # XLA: the hi/lo source split and the warm upper bound.
    s_rel = transformed - target.center_ref
    s2 = jnp.sum(s_rel * s_rel, axis=-1)
    s_hi, s_lo = _split_hi_lo(s_rel)
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
    smax = jnp.sqrt(jnp.max(s2))
    cmax = target.cmax
    eps = (
        jnp.float32(_EPS_REL)
        * (smax * cmax + cmax * cmax + smax * smax)
        + jnp.float32(1e-6)
    )
    # exact distance to the previous matched target point: a rigorous
    # upper bound (y_prev is in the cloud), pointwise tighter than the
    # triangle form sqrt(d_prev) + |Δs| it replaced; the (1+1e-5)
    # inflation over-covers the ~5e-7 relative f32 error of the norm
    ub_warm = (
        jnp.linalg.norm(transformed - state.prev_target, axis=-1)
        * jnp.float32(1.0 + 1e-5)
        + jnp.float32(1e-6)
    )
    aux = jnp.stack(
        [
            s2,
            ub_warm,
            (src_mask > 0).astype(jnp.float32),
            jnp.zeros_like(s2),
        ],
        axis=1,
    )
    adm_tile = bound_pass_pallas(
        saug, aux, target.caug, target.radii, eps, state.warm,
        gsrc=gsrc, interpret=interpret,
    )
    counts = jnp.sum(adm_tile, axis=1).astype(jnp.int32)
    overflow = jnp.any(counts > l_eff)

    def dense(_):
        idx, dist = nearest_neighbors_pallas(
            transformed, target.original_points, target.count,
            interpret=interpret,
        )
        return idx, dist, jnp.asarray(False)

    def rescore(_):
        # the table is built INSIDE the branch: iterations routed to
        # the dense/coarse arms never pay for it
        cand = _build_cand_table(adm_tile, counts, width)
        idx, dist = nearest_neighbors_cand(
            transformed, target.packed, cand,
            jnp.minimum(counts, l_eff),
            g=g, gsrc=gsrc, interpret=interpret,
        )
        return idx, dist, jnp.asarray(True)

    # coarse middle arm (round 3): when the fine-tile candidate set
    # overflows — the mid-convergence iterations that previously paid
    # the full dense scan — re-group admission to coarser tiles
    # (factor g2/g fewer ids for the same spatial volume) so the SAME
    # slot budget covers it.  Coarse admission is a strict superset of
    # fine admission, so exactness is untouched; the arm only engages
    # when it does at most ~5/8 of the dense row work (l_eff2 cap),
    # otherwise dense is the faster scan.
    g2 = _coarse_tile_rows(g, gsrc)
    c2 = m // g2 if g2 else 0
    if g2 and m % g2 == 0 and c2 >= 8:
        f = g2 // g
        adm2 = jnp.any(adm_tile.reshape(ts, c2, f), axis=2)
        counts2 = jnp.sum(adm2, axis=1).astype(jnp.int32)
        l_eff2 = min(l_budget, (5 * c2) // 8)
        width2 = -(-min(l_budget, c2) // 8) * 8
        overflow2 = jnp.any(counts2 > l_eff2)

        def coarse(_):
            cand2 = _build_cand_table(adm2, counts2, width2)
            idx, dist = nearest_neighbors_cand(
                transformed, target.packed, cand2,
                jnp.minimum(counts2, l_eff2),
                g=g2, gsrc=gsrc, interpret=interpret,
            )
            return idx, dist, jnp.asarray(True)

        idx, dist, used_sparse = jax.lax.cond(
            overflow,
            lambda _: jax.lax.cond(overflow2, dense, coarse, None),
            rescore,
            None,
        )
    else:
        idx, dist, used_sparse = jax.lax.cond(
            overflow, dense, rescore, None
        )
    # no-match contract: both arms normalize to the jnp oracle's
    # (idx=0, dist=BIG) in their wrappers; re-assert it here so the
    # contract holds even if a future kernel change regresses it —
    # downstream index arithmetic (e.g. the sharded global-index
    # offset) relies on idx staying in range
    idx = jnp.where(dist >= jnp.float32(BIG), 0, idx)
    # the matched-point gather: in the ICP loop the body performs the
    # SAME gather (original_points[idx]) for Procrustes, so XLA CSEs
    # this one away; standalone callers pay one O(N) gather
    return idx, dist, HierState(
        prev_target=target.original_points[idx],
        warm=jnp.asarray(True),
        sparse=used_sparse,
    )


@partial(
    jax.jit, static_argnames=("l_budget", "g", "gsrc", "interpret")
)
def nearest_neighbors_hier_batch(
    transformed: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: HierTarget,
    state: HierState,
    l_budget: int = DEFAULT_L,
    g: int = DEFAULT_G,
    gsrc: int = DEFAULT_GSRC,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, HierState]:
    """Batched ``nearest_neighbors_hier``: every input gains a leading
    pair axis (``target``/``state`` leaves included; build them under
    ``jax.vmap`` of ``prepare_hier_target``/``hier_state_init``).

    One structural difference from vmapping the solo path: the
    dense-fallback decision is GLOBAL over the batch (``lax.cond`` on
    ``any(overflow)``), because a per-pair batched cond would execute
    BOTH arms for the whole batch.  All pairs therefore run dense while
    ANY pair's candidate set overflows — exact either way, and pairs
    traverse the large-motion regime together in practice."""
    from tpuslam.kernels.pallas_bound import bound_pass_pallas_batch
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas_batch
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand_batch

    b, n = transformed.shape[0], transformed.shape[1]
    m = target.packed.shape[1]
    c = m // g
    if n < gsrc:  # small pairs: one group is the whole cloud
        gsrc = n
    ts = n // gsrc
    assert n % gsrc == 0
    width = table_width(m, g, l_budget)
    l_eff = min(l_budget, c)

    s_rel = transformed - target.center_ref[:, None, :]
    s2 = jnp.sum(s_rel * s_rel, axis=-1)  # [B, N]
    s_hi, s_lo = _split_hi_lo(s_rel)
    neg2_hi = (-2.0 * s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    neg2_lo = (-2.0 * s_lo.astype(jnp.float32)).astype(jnp.bfloat16)
    ones = jnp.ones_like(s2, jnp.bfloat16)[..., None]
    saug = jnp.concatenate(
        [neg2_hi, neg2_hi, neg2_lo, ones, ones, jnp.zeros_like(ones)],
        axis=2,
    )
    smax = jnp.sqrt(jnp.max(s2, axis=1))  # [B]
    cmax = target.cmax
    eps = (
        jnp.float32(_EPS_REL)
        * (smax * cmax + cmax * cmax + smax * smax)
        + jnp.float32(1e-6)
    )
    ub_warm = (
        jnp.linalg.norm(transformed - state.prev_target, axis=-1)
        * jnp.float32(1.0 + 1e-5)
        + jnp.float32(1e-6)
    )
    aux = jnp.stack(
        [
            s2,
            ub_warm,
            (src_mask > 0).astype(jnp.float32),
            jnp.zeros_like(s2),
        ],
        axis=2,
    )
    adm_tile = bound_pass_pallas_batch(
        saug, aux, target.caug, target.radii, eps, state.warm,
        gsrc=gsrc, interpret=interpret,
    )  # [B, ts, C]
    counts = jnp.sum(adm_tile, axis=2).astype(jnp.int32)  # [B, ts]
    overflow = jnp.any(counts > l_eff)  # global: see docstring

    def dense(_):
        idx, dist = nearest_neighbors_pallas_batch(
            transformed, target.original_points, target.count,
            interpret=interpret,
        )
        return idx, dist, jnp.asarray(False)

    def rescore(_):
        cand = _build_cand_table(
            adm_tile.reshape(b * ts, c), counts.reshape(b * ts), width
        ).reshape(b, ts, width)
        idx, dist = nearest_neighbors_cand_batch(
            transformed, target.packed, cand,
            jnp.minimum(counts, l_eff),
            g=g, gsrc=gsrc, interpret=interpret,
        )
        return idx, dist, jnp.asarray(True)

    # coarse middle arm, global like the dense cond (see the solo path)
    g2 = _coarse_tile_rows(g, gsrc)
    c2 = m // g2 if g2 else 0
    if g2 and m % g2 == 0 and c2 >= 8:
        f = g2 // g
        adm2 = jnp.any(adm_tile.reshape(b, ts, c2, f), axis=3)
        counts2 = jnp.sum(adm2, axis=2).astype(jnp.int32)
        l_eff2 = min(l_budget, (5 * c2) // 8)
        width2 = -(-min(l_budget, c2) // 8) * 8
        overflow2 = jnp.any(counts2 > l_eff2)

        def coarse(_):
            cand2 = _build_cand_table(
                adm2.reshape(b * ts, c2), counts2.reshape(b * ts),
                width2,
            ).reshape(b, ts, width2)
            idx, dist = nearest_neighbors_cand_batch(
                transformed, target.packed, cand2,
                jnp.minimum(counts2, l_eff2),
                g=g2, gsrc=gsrc, interpret=interpret,
            )
            return idx, dist, jnp.asarray(True)

        idx, dist, used_sparse = jax.lax.cond(
            overflow,
            lambda _: jax.lax.cond(overflow2, dense, coarse, None),
            rescore,
            None,
        )
    else:
        idx, dist, used_sparse = jax.lax.cond(
            overflow, dense, rescore, None
        )
    idx = jnp.where(dist >= jnp.float32(BIG), 0, idx)
    prev_target = jnp.take_along_axis(
        target.original_points, idx[..., None], axis=1
    )
    return idx, dist, HierState(
        prev_target=prev_target,
        warm=jnp.ones((b,), bool),
        sparse=jnp.broadcast_to(used_sparse, (b,)),
    )


@partial(jax.jit, static_argnames=("l_budget", "g", "gsrc", "interpret"))
def _hier_solo(transformed, src_mask, target, state,
               l_budget, g, gsrc, interpret):
    return nearest_neighbors_hier(
        transformed, src_mask, target, state,
        l_budget=l_budget, g=g, gsrc=gsrc, interpret=interpret,
    )


@lru_cache(maxsize=None)
def _hier_custom_vmap(l_budget: int, g: int, gsrc: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def fn(transformed, src_mask, target, state):
        return nearest_neighbors_hier(
            transformed, src_mask, target, state,
            l_budget=l_budget, g=g, gsrc=gsrc, interpret=interpret,
        )

    @fn.def_vmap
    def _rule(axis_size, in_batched, transformed, src_mask, target,
              state):
        tb, mb, tgt_b, st_b = in_batched

        def bc(x, isb):
            return x if isb else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x)
            )

        transformed = bc(transformed, tb)
        src_mask = bc(src_mask, mb)
        target = jax.tree.map(bc, target, tgt_b)
        state = jax.tree.map(bc, state, st_b)
        out = nearest_neighbors_hier_batch(
            transformed, src_mask, target, state,
            l_budget=l_budget, g=g, gsrc=gsrc, interpret=interpret,
        )
        return out, (True, True, HierState(True, True, True))

    return fn


def nearest_neighbors_hier_auto(
    transformed: jnp.ndarray,
    src_mask: jnp.ndarray,
    target: HierTarget,
    state: HierState,
    l_budget: int = DEFAULT_L,
    g: int = DEFAULT_G,
    gsrc: int = DEFAULT_GSRC,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, HierState]:
    """vmap-aware front of the hierarchical NN: a direct call is the
    solo path; under ``jax.vmap`` (batched multi-pair registration) the
    custom-vmap rule lowers to ``nearest_neighbors_hier_batch`` — one
    batch-grid kernel launch per stage — instead of failing to batch
    the scalar-prefetch pallas_call (the round-2 limitation that pinned
    the vmapped ICP lowering to the dense kernel)."""
    return _hier_custom_vmap(l_budget, g, gsrc, interpret)(
        transformed, src_mask, target, state
    )
