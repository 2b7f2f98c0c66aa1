"""Pallas TPU kernels: candidate-driven (tile-skipping) CPD E-step.

The dense two-phase E-step (``pallas_cpd``) evaluates every
(target, moving) pair.  But with truncation active (the reference's
Hybrid mode, ``coherentpointdrift.cpp:191-196``) most pairs contribute
EXACTLY zero once the mixture tightens: the kernel zeroes ``exp(expo)``
for ``expo < log(truncate)`` by construction.  Summands that are
exactly +0.0 can be skipped without changing ANY partial sum bitwise —
so whole (target-tile, moving-tile) block pairs whose rigorous minimum
distance puts every pair past the cutoff are simply never visited, and
the result stays bit-identical to the dense kernel on the same inputs.
Without truncation everything is admitted and the wrapper routes to
the dense kernel (an exact-mode f32-underflow cutoff at expo < -120
existed in round 3 but measured 1.00x in-loop — by the time sigma^2 is
small enough for ~15.5-sigma pair distances to underflow, EM has
converged — and was removed).

Mechanics mirror the hierarchical NN (``ops/nn_hier``): both clouds
enter Morton-sorted (the CPD driver sorts once per registration — an
UNSORTED cloud is still correct, its fat tile bounds just admit
everything and the wrapper falls back to the dense kernel), per-block
bounding spheres give a conservative block-pair admission matrix, the
rank-count compaction builds per-block candidate tables, and
scalar-prefetch candidate kernels accumulate over admitted blocks only
(count-gated slots, ascending block order = the dense kernel's
accumulation order over the nonzero terms).

The skip rate is dynamic — d_cut^2 = -expo_cut * 2 sigma^2 shrinks as
EM converges — so admission is recomputed every iteration (a [Tn, Tm] jnp
matrix, trivial) and a global lax.cond routes to the dense kernel when
the candidate sets overflow the static budget (early iterations).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.algorithms.cpd import Sufficient
from tpuslam.core.types import round_up
from tpuslam.kernels.pallas_cpd import (
    SENTINEL,
    _TILE,
    _gauss,
    cpd_estep_pallas,
    denom_pass_batch,
    moments_pass_batch,
)
from tpuslam.ops.nn_hier import _build_cand_table
from tpuslam.ops.spatial import tile_bounds

SLOTS = 8
# candidate budget as a fraction of the block count: above ~5/8 of the
# blocks admitted, the dense scan is at least as fast
_BUDGET_NUM, _BUDGET_DEN = 5, 8
# scalar-prefetch tables live in SMEM (1 MB/core)
_TABLE_SMEM_BYTES = 512 * 1024
# budget of over-admitting ("fat") blocks served by the dense subset
# passes; more than the (size-scaled) budget falls back to the full
# dense kernel.  8 sufficed through 376k (the top-level octant-crossing
# Morton runs number ~3 there); at 1.3M the SMEM-clamped table width
# (~104) is exceeded by every SECOND-level crossing run too (~60
# blocks), so the budget scales as Tn/16 — the gathered dense subset
# pass costs fat_max*TILE*M pairs ONLY when fats exist (lax.cond) and
# stays ~1% of the dense kernel it replaces
_FAT_MAX = 8


def _fat_budget(t_blocks: int) -> int:
    return max(_FAT_MAX, t_blocks // 16)


def _super_factor(t_slots: int, t_grid: int) -> int:
    """Blocks gathered per candidate-table slot.  1 through mustang
    scale; grows (2/4/8) when the 5/8-of-blocks table would not fit
    the SMEM cap — at 1.3M (1270x1270 blocks) slots gather 8
    consecutive blocks, so the table holds 159 super-ids x 99 slots
    instead of failing to hold 1270 x 793.  Bit-identity is preserved
    because the kernel accumulates each super-slot's blocks
    SEQUENTIALLY in ascending order (the dense kernel's order) and any
    over-admitted block contributes exact +0.0 terms."""
    cap = max(_TABLE_SMEM_BYTES // 4 // max(t_grid, 1), SLOTS)
    for s in (1, 2, 4):
        if max(_BUDGET_NUM * (t_slots // s) // _BUDGET_DEN, 1) <= cap:
            return s
    return 8


def _denom_cand_kernel(s, counts_ref, cand_ref, sc_ref, xT_ref, *refs):
    del cand_ref
    t_refs = refs[:SLOTS]
    denom_ref = refs[SLOTS]
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        denom_ref[:] = jnp.full_like(denom_ref, sc_ref[0, 1])

    live = counts_ref[i] - j * SLOTS
    xT = xT_ref[:]  # [3, BN] — targets on lanes
    for r in range(SLOTS):
        @pl.when(r < live)
        def _(r=r):
            if s == 1:
                g = _gauss(
                    t_refs[r][:], xT,
                    sc_ref[0, 0], sc_ref[0, 2], sc_ref[0, 3],
                )
                denom_ref[0] += jnp.sum(g, axis=0)
            else:
                # per-_TILE-block SEQUENTIAL accumulation = the dense
                # kernel's reduction order (bit-identity contract); a
                # fori_loop, not an unrolled range: unrolled, Mosaic
                # keeps every h's [_TILE, BN] g matrix live at once and
                # blows the 16 MB scoped-VMEM stack at s=8 (measured)
                def h_body(h, carry):
                    blk = t_refs[r][pl.dslice(h * _TILE, _TILE), :]
                    g = _gauss(
                        blk, xT,
                        sc_ref[0, 0], sc_ref[0, 2], sc_ref[0, 3],
                    )
                    denom_ref[0] += jnp.sum(g, axis=0)
                    return carry

                jax.lax.fori_loop(0, s, h_body, 0)


def _moments_cand_kernel(s, counts_ref, cand_ref, sc_ref, tyT_ref, *refs):
    del cand_ref
    t_refs = refs[:SLOTS]
    acc_ref = refs[SLOTS]
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    live = counts_ref[j] - i * SLOTS
    tyT = tyT_ref[:]  # [3, BM] — moving points on lanes
    for r in range(SLOTS):
        @pl.when(r < live)
        def _(r=r):
            if s == 1:
                xw = t_refs[r][:]  # [BN, 8] — (x, y, z, 0, w0..w3)
                g = _gauss(
                    xw[:, 0:3], tyT,
                    sc_ref[0, 0], sc_ref[0, 2], sc_ref[0, 3],
                )
                for c in range(4):
                    acc_ref[c] += jnp.sum(
                        g * xw[:, 4 + c:5 + c], axis=0
                    )
            else:
                # sequential per-block fori_loop (see denom kernel)
                def h_body(h, carry):
                    xw = t_refs[r][pl.dslice(h * _TILE, _TILE), :]
                    g = _gauss(
                        xw[:, 0:3], tyT,
                        sc_ref[0, 0], sc_ref[0, 2], sc_ref[0, 3],
                    )
                    for c in range(4):
                        acc_ref[c] += jnp.sum(
                            g * xw[:, 4 + c:5 + c], axis=0
                        )
                    return carry

                jax.lax.fori_loop(0, s, h_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("truncate", "interpret", "checked", "force_super"),
)
def cpd_estep_cand(
    transformed: jnp.ndarray,
    moving_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    constant: jnp.ndarray,
    trunc_active: jnp.ndarray,
    truncate: float = 1e-3,
    interpret: bool = False,
    checked: bool = False,
    force_super=None,  # (s_m, s_n) override — tests exercise s>1 at
    # small sizes without a 32k-block interpret run
) -> Sufficient:
    """Drop-in replacement for ``cpd_estep_pallas`` (same contract, same
    bits) that skips block pairs proven to contribute exact zeros.  Most
    effective when both clouds are Morton-sorted (see module docstring);
    correct for any row order.

    ``checked=True`` returns ``(Sufficient, overflow bool[])`` and emits
    NO ``lax.cond``: the candidate path runs unconditionally, and when
    ``overflow`` is True its statistics are INVALID (dropped admissible
    blocks) and must be discarded by the caller.  This exists for
    specialized while_loop bodies: a ``lax.cond(overflow, dense, cand)``
    inside a dynamic-trip loop costs ~the dense branch even when the
    candidate branch is taken (measured round 5: the Hybrid slow phase
    ran 1.15 s/iter in-loop vs 0.23-0.34 standalone at 376k,
    ``bench_results/hybrid_r5_probe.json`` — the same TPU pathology as
    round 3's fast/slow cond, ``tools/probe_cond_dyn.py``); callers
    treat overflow like divergence — freeze the iteration and leave the
    specialized loop, letting the trailing cond-based fallback loop
    redo it correctly."""
    m0, n0 = transformed.shape[0], target.shape[0]
    tn0, tm0 = round_up(n0, _TILE) // _TILE, round_up(m0, _TILE) // _TILE
    # slots gather s consecutive blocks when a plain per-block table
    # would not fit SMEM (see _super_factor) — s_m for the moving side
    # (denom kernel slots), s_n for the target side (moments slots)
    if force_super is not None:
        s_m, s_n = force_super
    else:
        s_m = _super_factor(tm0, tn0)
        s_n = _super_factor(tn0, tm0)
    m = round_up(m0, _TILE * s_m)
    n = round_up(n0, _TILE * s_n)
    tn, tm = n // _TILE, m // _TILE
    tm_s, tn_s = tm // s_m, tn // s_n
    # candidate-table width (in super-slot units): the 5/8-of-blocks
    # win threshold, clamped to the SMEM budget — at 1.3M (1270 blocks)
    # the round-4 per-block 800-wide table was 4 MB against the 512 KB
    # budget and EVERY truncated iteration fell back to the 13.3 s/iter
    # dense kernel (bench_results/cpd_large_1m.log r5)
    smem_cap_m = max(_TABLE_SMEM_BYTES // 4 // max(tn, 1), SLOTS)
    smem_cap_n = max(_TABLE_SMEM_BYTES // 4 // max(tm, 1), SLOTS)
    width_m = -(-min(tm_s, max(_BUDGET_NUM * tm_s // _BUDGET_DEN, 1),
                     smem_cap_m) // SLOTS) * SLOTS
    width_n = -(-min(tn_s, max(_BUDGET_NUM * tn_s // _BUDGET_DEN, 1),
                     smem_cap_n) // SLOTS) * SLOTS
    if tn < 2 or tm < 2:
        # too small to skip anything
        out = cpd_estep_pallas(
            transformed, moving_mask, target, target_mask, sigma2,
            constant, trunc_active, truncate=truncate,
            interpret=interpret,
        )
        return (out, jnp.asarray(False)) if checked else out

    if m != m0:
        transformed = jnp.pad(transformed, ((0, m - m0), (0, 0)))
        moving_mask = jnp.pad(moving_mask, (0, m - m0))
    if n != n0:
        target = jnp.pad(target, ((0, n - n0), (0, 0)))
        target_mask = jnp.pad(target_mask, (0, n - n0))

    sigma2 = jnp.asarray(sigma2, jnp.float32)
    constant = jnp.asarray(constant, jnp.float32)

    # rigorous block-pair admission: skip (i, j) only when the MINIMUM
    # possible pair distance already puts the exponent past the cutoff.
    # Bounds are computed at 128-row SUB-tile granularity and min-pooled
    # to kernel blocks: a Morton run crossing a high-bit octant boundary
    # gives its 1024-row block a bounding sphere spanning half the cloud
    # (radius 0.32 on a 0.5-extent cloud, measured), which would admit
    # everything; at 128 rows only the one crossing sub-tile stays fat.
    # finest sub-tile granularity whose [Tn*f, Tm*f] bound matrix stays
    # <= 64M elements (8 at <=~1M rows; 4 at 1.3M — still isolating the
    # octant-crossing fat runs to 256-row sub-tiles instead of letting
    # a whole 1024-row block go fat)
    f_sub = next(
        f for f in (8, 4, 2, 1)
        if (tn * f) * (tm * f) <= 64 * 1024 * 1024
    )
    sub = _TILE // f_sub
    tb_n = tile_bounds(target, target_mask, sub)
    tb_m = tile_bounds(transformed, moving_mask, sub)
    diff = tb_n.centers[:, None, :] - tb_m.centers[None, :, :]
    cdist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    lb = jnp.maximum(
        cdist - tb_n.radii[:, None] - tb_m.radii[None, :], 0.0
    ) * jnp.float32(1.0 - 1e-5)
    lb = jnp.min(
        lb.reshape(tn, f_sub, tm, f_sub), axis=(1, 3)
    )  # [Tn, Tm]
    d2_cut = (
        -jnp.float32(math.log(truncate))
        * 2.0 * sigma2 * jnp.float32(1.0 + 1e-5)
    )
    # no truncation -> admit everything (forces the dense fallback via
    # the overflow cond below); see module doc on the removed exact arm
    # super-slot admission: pool the block-level lower bounds over each
    # slot's s consecutive blocks (min = any block reachable admits the
    # slot; over-admitted sibling blocks contribute exact zeros)
    lb_m = lb.reshape(tn, tm_s, s_m).min(axis=2)  # [Tn, Tm/s_m]
    lb_n = lb.reshape(tn_s, s_n, tm).min(axis=1)  # [Tn/s_n, Tm]
    adm_m = jnp.logical_or(
        jnp.logical_not(trunc_active), (lb_m * lb_m) <= d2_cut
    )  # [Tn, Tm_s]
    adm_n = jnp.logical_or(
        jnp.logical_not(trunc_active), (lb_n * lb_n) <= d2_cut
    )  # [Tn_s, Tm]

    counts_n = jnp.sum(adm_m, axis=1).astype(jnp.int32)  # per target blk
    counts_m = jnp.sum(adm_n, axis=0).astype(jnp.int32)  # per moving blk
    # blocks whose candidate set overflows the table run through a
    # gathered DENSE subset pass instead (a handful of octant-crossing
    # blocks in practice); only more than the size-scaled fat budget
    # of them forces the full-dense fallback
    fat_n = counts_n > width_m
    fat_m = counts_m > width_n
    overflow = jnp.logical_or(
        jnp.sum(fat_n) > _fat_budget(tn), jnp.sum(fat_m) > _fat_budget(tm)
    )

    ty = jnp.where(moving_mask[:, None] > 0, transformed, SENTINEL)
    scalars = jnp.stack(
        [
            -0.5 / sigma2,
            constant,
            trunc_active.astype(jnp.float32),
            jnp.full((), math.log(truncate), jnp.float32),
        ]
    ).reshape(1, 4)

    def dense(_):
        return cpd_estep_pallas(
            transformed[:m0], moving_mask[:m0], target[:n0],
            target_mask[:n0], sigma2, constant, trunc_active,
            truncate=truncate, interpret=interpret,
        )

    def cand(_):
        # under checked=True the caller DISCARDS overflow results, so
        # zero every slot count when overflowing: the kernels become
        # count-gated no-ops (~30 ms of empty grid steps at 376k
        # instead of a ~460 ms wasted attempt at the slow-phase entry,
        # hybrid_marginal_r5.log).  In the unchecked path this branch
        # only runs when NOT overflowing, where the where() is an
        # identity — bit-identical either way.
        counts_n_s = jnp.where(
            jnp.logical_or(fat_n, overflow), 0, counts_n
        )
        counts_m_s = jnp.where(
            jnp.logical_or(fat_m, overflow), 0, counts_m
        )
        cand_m = _build_cand_table(
            adm_m, counts_n_s, width_m
        )  # [Tn, widthM] of moving super-ids
        denom = pl.pallas_call(
            functools.partial(_denom_cand_kernel, s_m),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(tn, width_m // SLOTS),
                in_specs=[
                    pl.BlockSpec((1, 4), lambda i, j, ct, cr: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3, _TILE), lambda i, j, ct, cr: (0, i)),
                    *[
                        pl.BlockSpec(
                            (s_m * _TILE, 3),
                            lambda i, j, ct, cr, r=r: (
                                cr[i, j * SLOTS + r], 0
                            ),
                        )
                        for r in range(SLOTS)
                    ],
                ],
                out_specs=pl.BlockSpec(
                    (1, _TILE), lambda i, j, ct, cr: (0, i)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
            interpret=interpret,
            # s>1: Mosaic allocates each unrolled slot branch's [_TILE,
            # BN] g on the scoped stack simultaneously (~64 MB at s=8)
            # instead of reusing one — raise the scoped limit (v5e VMEM
            # is 128 MB); s=1 keeps the default 16 MB budget
            compiler_params=(
                pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ) if s_m > 1 else None
            ),
        )(
            counts_n_s, cand_m, scalars, jnp.swapaxes(target, 0, 1),
            *([ty] * SLOTS),
        ).reshape(n)

        # fat target blocks: their denominators come from the dense
        # phase-1 pass on a gathered subset — same moving-block
        # accumulation order, so bit-identical to the full dense kernel
        def add_fat_n(d):
            ids = jnp.nonzero(fat_n, size=_fat_budget(tn), fill_value=tn)[0]
            rows = (
                ids[:, None] * _TILE
                + jnp.arange(_TILE, dtype=ids.dtype)[None, :]
            ).reshape(-1)
            sub_tgt = target.at[rows].get(
                mode="fill", fill_value=0.0
            )
            d_sub = denom_pass_batch(
                scalars, ty[None], sub_tgt[None], interpret
            ).reshape(-1)
            return d.at[rows].set(d_sub, mode="drop")

        denom = jax.lax.cond(
            jnp.logical_and(jnp.any(fat_n), jnp.logical_not(overflow)),
            add_fat_n, lambda d: d, denom
        )

        pt1 = (1.0 - constant / denom) * target_mask
        inv_denom = target_mask / denom
        xw = jnp.concatenate(
            [
                target,
                jnp.zeros((n, 1), jnp.float32),
                inv_denom[:, None],
                target * inv_denom[:, None],
            ],
            axis=1,
        )  # [N, 8]

        cand_n = _build_cand_table(
            adm_n.T, counts_m_s, width_n
        )  # [Tm, widthN] of target super-ids
        acc = pl.pallas_call(
            functools.partial(_moments_cand_kernel, s_n),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(tm, width_n // SLOTS),
                in_specs=[
                    pl.BlockSpec((1, 4), lambda j, i, ct, cr: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3, _TILE), lambda j, i, ct, cr: (0, j)),
                    *[
                        pl.BlockSpec(
                            (s_n * _TILE, 8),
                            lambda j, i, ct, cr, r=r: (
                                cr[j, i * SLOTS + r], 0
                            ),
                        )
                        for r in range(SLOTS)
                    ],
                ],
                out_specs=pl.BlockSpec(
                    (4, _TILE), lambda j, i, ct, cr: (0, j)
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((4, m), jnp.float32),
            interpret=interpret,
            compiler_params=(
                pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ) if s_n > 1 else None
            ),
        )(
            counts_m_s, cand_n, scalars, jnp.swapaxes(ty, 0, 1),
            *([xw] * SLOTS),
        )

        # fat moving blocks: dense phase-2 on a gathered subset (same
        # target-block accumulation order -> bit-identical)
        def add_fat_m(a):
            ids = jnp.nonzero(fat_m, size=_fat_budget(tm), fill_value=tm)[0]
            rows = (
                ids[:, None] * _TILE
                + jnp.arange(_TILE, dtype=ids.dtype)[None, :]
            ).reshape(-1)
            sub_ty = ty.at[rows].get(
                mode="fill", fill_value=SENTINEL
            )
            weights4 = xw[:, 4:8]
            a_sub = moments_pass_batch(
                scalars, sub_ty[None], target[None], weights4[None],
                interpret,
            )[0]  # [4, fat_budget * _TILE]
            return a.at[:, rows].set(a_sub, mode="drop")

        acc = jax.lax.cond(
            jnp.logical_and(jnp.any(fat_m), jnp.logical_not(overflow)),
            add_fat_m, lambda a: a, acc
        )

        p1 = acc[0, :] * moving_mask
        px = jnp.swapaxes(acc[1:4, :], 0, 1) * moving_mask[:, None]
        n_valid = jnp.sum(target_mask)
        err = (
            -jnp.sum(jnp.log(denom) * target_mask)
            + 3.0 * n_valid * jnp.log(sigma2) / 2.0
        )
        return Sufficient(
            p1=p1[:m0], pt1=pt1[:n0], px=px[:m0], error=err
        )

    if checked:
        return cand(None), overflow
    return jax.lax.cond(overflow, dense, cand, None)
