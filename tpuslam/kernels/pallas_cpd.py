"""Pallas TPU kernels: CPD E-step sufficient statistics.

The TPU-native replacement for the reference's two E-step disasters —
the GPU host loop launching O(N) kernels (``cpdcuda.cu:80-116``) and the
FGT path that round-trips the whole E-step through the CPU
(``cpdcuda.cu:150-170``) — as a two-phase blocked evaluation that never
materializes the N x M responsibility matrix (the reference's own
sufficient-statistics memory strategy, ``cudaprobabilities.h:19-30``):

* **Phase 1 (denominators)**: grid (target tiles x moving tiles), the
  running ``denom[j] = sum_k exp(-d_kj^2 / 2 sigma^2) + c`` accumulated in
  a lane-aligned ``[1, N]`` output across moving tiles (targets on lanes,
  moving points on sublanes — the inner reduction is a sublane sum).
* **Phase 2 (moments)**: grid (moving tiles x target tiles), accumulating
  ``[p1, px] = G @ [1/denom, x/denom]`` into a ``[4, BM]`` block (moving
  points on lanes) as four sublane-sum reductions.  The Gaussian tile is
  recomputed — flash-attention-style recompute beats spilling an N x M
  intermediate to HBM.

Layout rules follow ``tpuslam.kernels.pallas_nn``: each operand enters in
the layout whose coordinate slices are free — the sublane-side cloud as
``[P, 3]``, the lane-side cloud TRANSPOSED as ``[3, P]`` (a lane-axis
column slice rebroadcast across lanes costs a relayout per tile, measured
~10x).  Distances use the exact-f32 per-coordinate FMA form (the matmul
shortcut's bf16-pass cancellation noise is fatal: the exponent divides by
``2 sigma^2`` ~ 1e-3 at convergence), and raw ``exp`` is safe — exponents
are <= 0 and the denominator is floored by the uniform constant
(``coherentpointdrift.cpp:204``).

Padded moving rows are placed at a far sentinel coordinate (their
Gaussian underflows to exactly 0); padded target columns carry zero
weights and are masked out of pt1/error.
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

# internal padding granule == tile size ([BM, BN] f32 Gaussian tile +
# temporaries fit VMEM at 1024x1024)
_TILE = 1024

# moving-cloud padding sentinel: far enough that exp underflows to 0 for
# any plausible sigma, near enough that d^2 stays finite in f32
SENTINEL = 1e15


def _gauss(sub, lanes_T, mult, trunc_flag, log_trunc):
    """exp(mult * d^2) tile: ``sub`` [BP, 3] on sublanes, ``lanes_T``
    [3, BQ] on lanes; optional truncation
    (``coherentpointdrift.cpp:191-196``)."""
    d = (sub[:, 0:1] - lanes_T[0:1, :]) ** 2
    d += (sub[:, 1:2] - lanes_T[1:2, :]) ** 2
    d += (sub[:, 2:3] - lanes_T[2:3, :]) ** 2
    expo = mult * d
    g = jnp.exp(expo)
    return jnp.where(
        jnp.logical_and(trunc_flag != 0, expo < log_trunc), 0.0, g
    )


@functools.partial(jax.jit, static_argnames=("truncate", "interpret"))
def cpd_estep_pallas(
    transformed: jnp.ndarray,
    moving_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    constant: jnp.ndarray,
    trunc_active: jnp.ndarray,
    truncate: float = 1e-3,
    interpret: bool = False,
) -> Sufficient:
    """Drop-in replacement for ``tpuslam.algorithms.cpd.cpd_estep``
    (``ComputePMatrix``, ``coherentpointdrift.cpp:167-221``).

    Delegates to the batched kernels with B=1 (the grid gains a unit
    leading dim, which lowers identically), so the solo and vmapped
    paths can never drift."""
    out = cpd_estep_pallas_batch(
        transformed[None],
        moving_mask[None],
        target[None],
        target_mask[None],
        jnp.reshape(jnp.asarray(sigma2, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(constant, jnp.float32), (1,)),
        jnp.reshape(jnp.asarray(trunc_active), (1,)),
        truncate=truncate,
        interpret=interpret,
    )
    return Sufficient(
        p1=out.p1[0], pt1=out.pt1[0], px=out.px[0], error=out.error[0]
    )


# NOTE: a single-pass VMEM-resident E-step variant (the Gaussian strip
# computed once, consumed for denominators AND moments via hi/lo bf16
# MXU contractions) lived here through round 2, gated at padded
# M <= 8192.  It was RETIRED after amortized measurement
# (tools/estep_chain.py): 1.12x slower than the two-phase recompute at
# 8k — exp was never the bound, and the one-shot timings that motivated
# it were dominated by ~9 ms of per-dispatch relay latency.  One kernel
# body (two-phase) now serves every size.


def _denom_kernel_batch(sc_ref, ty_ref, xT_ref, denom_ref):
    b = pl.program_id(0)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        # init with the uniform-component constant c
        denom_ref[:] = jnp.full_like(denom_ref, sc_ref[b, 1])

    g = _gauss(
        ty_ref[0], xT_ref[0], sc_ref[b, 0], sc_ref[b, 2], sc_ref[b, 3]
    )
    denom_ref[0] += jnp.sum(g, axis=0, keepdims=True)


def _moments_kernel_batch(sc_ref, x_ref, tyT_ref, w_ref, acc_ref):
    b = pl.program_id(0)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = _gauss(
        x_ref[0], tyT_ref[0], sc_ref[b, 0], sc_ref[b, 2], sc_ref[b, 3]
    )
    w = w_ref[0]  # [BN, 4] — target weights, column slices on sublanes
    rows = [
        jnp.sum(g * w[:, c:c + 1], axis=0, keepdims=True) for c in range(4)
    ]
    acc_ref[0] += jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("truncate", "interpret"))
def cpd_estep_pallas_batch(
    transformed: jnp.ndarray,
    moving_mask: jnp.ndarray,
    target: jnp.ndarray,
    target_mask: jnp.ndarray,
    sigma2: jnp.ndarray,
    constant: jnp.ndarray,
    trunc_active: jnp.ndarray,
    truncate: float = 1e-3,
    interpret: bool = False,
) -> Sufficient:
    """Batched E-step: leading pair axis B on every operand, per-pair
    scalars as i/f32[B] vectors read from SMEM by batch grid index.  One
    3-D-grid launch per phase for all B pairs (the batched multi-pair
    regime; the reference is strictly single-pair)."""
    b, m0 = transformed.shape[0], transformed.shape[1]
    n0 = target.shape[1]
    m = round_up(m0, _TILE)
    n = round_up(n0, _TILE)
    if m != m0:
        transformed = jnp.pad(transformed, ((0, 0), (0, m - m0), (0, 0)))
        moving_mask = jnp.pad(moving_mask, ((0, 0), (0, m - m0)))
    if n != n0:
        target = jnp.pad(target, ((0, 0), (0, n - n0), (0, 0)))
        target_mask = jnp.pad(target_mask, ((0, 0), (0, n - n0)))
    bm = bn = _TILE

    ty = jnp.where(moving_mask[:, :, None] > 0, transformed, SENTINEL)
    scalars = jnp.stack(
        [
            -0.5 / sigma2,
            constant,
            trunc_active.astype(jnp.float32),
            jnp.full((b,), math.log(truncate), jnp.float32),
        ],
        axis=1,
    )  # [B, 4]

    denom = denom_pass_batch(scalars, ty, target, interpret).reshape(b, n)

    pt1 = (1.0 - constant[:, None] / denom) * target_mask
    inv_denom = target_mask / denom
    weights4 = jnp.concatenate(
        [inv_denom[:, :, None], target * inv_denom[:, :, None]], axis=2
    )  # [B, N, 4]

    acc = moments_pass_batch(scalars, ty, target, weights4, interpret)

    p1 = acc[:, 0, :] * moving_mask
    px = jnp.swapaxes(acc[:, 1:4, :], 1, 2) * moving_mask[:, :, None]
    n_valid = jnp.sum(target_mask, axis=1)
    err = (
        -jnp.sum(jnp.log(denom) * target_mask, axis=1)
        + 3.0 * n_valid * jnp.log(sigma2) / 2.0
    )
    return Sufficient(
        p1=p1[:, :m0], pt1=pt1[:, :n0], px=px[:, :m0], error=err
    )


def denom_pass_batch(scalars, ty, target, interpret):
    """Raw phase-1 pass: ``denom`` f32[B, 1, N] for every target row
    over ALL moving rows (init = the uniform constant).  Exposed so the
    candidate E-step (``pallas_cpd_cand``) can run it on a gathered
    fat-block subset with bit-identical accumulation order.  Shapes must
    be _TILE multiples."""
    b, m = ty.shape[0], ty.shape[1]
    n = target.shape[1]
    bm = bn = _TILE
    return pl.pallas_call(
        _denom_kernel_batch,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n // bn, m // bm),
            in_specs=[
                pl.BlockSpec((1, bm, 3), lambda p, i, j, *_: (p, j, 0)),
                pl.BlockSpec((1, 3, bn), lambda p, i, j, *_: (p, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bn), lambda p, i, j, *_: (p, 0, i)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * n * m,
            bytes_accessed=b * (n * 3 + m * 3 + n) * 4,
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(scalars, ty, jnp.swapaxes(target, 1, 2))


def moments_pass_batch(scalars, ty, target, weights4, interpret):
    """Raw phase-2 pass: ``acc`` f32[B, 4, M] moment accumulators for
    every moving row over ALL target rows.  Exposed for the candidate
    E-step's fat-block subset (see ``denom_pass_batch``)."""
    b, m = ty.shape[0], ty.shape[1]
    n = target.shape[1]
    bm = bn = _TILE
    return pl.pallas_call(
        _moments_kernel_batch,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((1, bn, 3), lambda p, j, i, *_: (p, i, 0)),
                pl.BlockSpec((1, 3, bm), lambda p, j, i, *_: (p, 0, j)),
                pl.BlockSpec((1, bn, 4), lambda p, j, i, *_: (p, i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 4, bm), lambda p, j, i, *_: (p, 0, j)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 4, m), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=20 * b * n * m,
            bytes_accessed=b * (n * 7 + m * 7) * 4,
            transcendentals=b * n * m,
        ),
        interpret=interpret,
    )(scalars, target, jnp.swapaxes(ty, 1, 2), weights4)
