"""Pallas TPU kernels: CPD E-step sufficient statistics.

The TPU-native replacement for the reference's two E-step disasters —
the GPU host loop launching O(N) kernels (``cpdcuda.cu:80-116``) and the
FGT path that round-trips the whole E-step through the CPU
(``cpdcuda.cu:150-170``) — as a two-phase blocked evaluation that never
materializes the N x M responsibility matrix (the reference's own
sufficient-statistics memory strategy, ``cudaprobabilities.h:19-30``):

* **Phase 1 (denominators)**: grid (target tiles x moving tiles), the
  running ``denom[j] = sum_k exp(-d_kj^2 / 2 sigma^2) + c`` accumulated in
  a lane-aligned ``[1, N]`` output across moving tiles.
* **Phase 2 (moments)**: grid (moving tiles x target tiles), accumulating
  ``[p1, px] = G @ [1/denom, x/denom]`` into a ``[BM, 4]`` block — the
  Gaussian tile is recomputed (flash-attention-style recompute beats
  spilling an N x M intermediate to HBM).

Numerics mirror ``tpuslam.kernels.pallas_nn``: squared distances use the
exact per-coordinate FMA form (the matmul shortcut's bf16-pass
cancellation noise is fatal here too — the exponent divides by
``2 sigma^2`` which shrinks to ~1e-3 at convergence), and the 4-column
contraction in phase 2 runs as four lane-broadcast FMA reductions, not a
skinny MXU matmul.  Raw ``exp`` is safe: exponents are <= 0 and the
denominator is floored by the uniform constant
(``coherentpointdrift.cpp:204``).

Padded moving rows are handled by the caller placing them at a far
sentinel coordinate (their Gaussian underflows to exactly 0); padded
target columns are masked by the caller via the ``weights4`` input and
the pt1/error masks.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.algorithms.cpd import Sufficient

_MAX_TILE_ELEMS = 1024 * 1024
LOG_TRUNC_DEFAULT = math.log(1e-3)

# moving-cloud padding sentinel: far enough that exp underflows to 0 for
# any plausible sigma, near enough that d^2 stays finite in f32
SENTINEL = 1e15


def _pick_block(n: int, prefer: Tuple[int, ...] = (512, 256, 128)) -> int:
    for b in prefer:
        if n % b == 0:
            return b
    return n


def _gauss_tile(y, x, mult, trunc_flag, log_trunc):
    """exp(mult * d^2) for a [BM_y, BN_x] tile, exact-FMA distances,
    optional truncation (``coherentpointdrift.cpp:191-196``)."""
    d = (y[:, 0:1] - x[:, 0][None, :]) ** 2
    d += (y[:, 1:2] - x[:, 1][None, :]) ** 2
    d += (y[:, 2:3] - x[:, 2][None, :]) ** 2
    expo = mult * d
    g = jnp.exp(expo)
    return jnp.where(
        jnp.logical_and(trunc_flag != 0, expo < log_trunc), 0.0, g
    )


def _denom_kernel(scalar_ref, ty_ref, x_ref, denom_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        # init with the uniform-component constant c
        denom_ref[:] = jnp.full_like(denom_ref, scalar_ref[1])

    g = _gauss_tile(
        ty_ref[:], x_ref[:], scalar_ref[0], scalar_ref[2], scalar_ref[3]
    )
    denom_ref[:] += jnp.sum(g, axis=0, keepdims=True)


def _moments_kernel(scalar_ref, ty_ref, x_ref, w_ref, acc_ref):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = _gauss_tile(
        ty_ref[:], x_ref[:], scalar_ref[0], scalar_ref[2], scalar_ref[3]
    )  # [BM, BN]
    w = w_ref[:]  # [BN, 4]
    # four lane-broadcast FMA reductions (exact f32; a [BM,BN]x[BN,4]
    # MXU matmul would run bf16 passes)
    cols = [
        jnp.sum(g * w[:, c][None, :], axis=1, keepdims=True)
        for c in range(4)
    ]
    acc_ref[:] += jnp.concatenate(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
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
    (``ComputePMatrix``, ``coherentpointdrift.cpp:167-221``)."""
    m = transformed.shape[0]
    n = target.shape[0]
    bm = _pick_block(m)
    bn = _pick_block(n)
    while bm * bn > _MAX_TILE_ELEMS and bm > 128:
        bm //= 2

    # padded moving rows -> far sentinel so their Gaussian is exactly 0
    ty = jnp.where(moving_mask[:, None] > 0, transformed, SENTINEL)
    scalars = jnp.stack(
        [
            -0.5 / sigma2,
            constant,
            trunc_active.astype(jnp.float32),
            jnp.float32(math.log(truncate)),
        ]
    )

    denom = pl.pallas_call(
        _denom_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // bn, m // bm),
            in_specs=[
                pl.BlockSpec((bm, 3), lambda i, j, *_: (j, 0)),
                pl.BlockSpec((bn, 3), lambda i, j, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((1, bn), lambda i, j, *_: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * m,
            bytes_accessed=(n * 3 + m * 3 + n) * 4,
            transcendentals=n * m,
        ),
        interpret=interpret,
    )(scalars, ty, target).reshape(n)

    pt1 = (1.0 - constant / denom) * target_mask
    inv_denom = target_mask / denom
    weights4 = jnp.concatenate(
        [inv_denom[:, None], target * inv_denom[:, None]], axis=1
    )  # [N, 4]

    acc = pl.pallas_call(
        _moments_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // bm, n // bn),
            in_specs=[
                pl.BlockSpec((bm, 3), lambda j, i, *_: (j, 0)),
                pl.BlockSpec((bn, 3), lambda j, i, *_: (i, 0)),
                pl.BlockSpec((bn, 4), lambda j, i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((bm, 4), lambda j, i, *_: (j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=20 * n * m,
            bytes_accessed=(n * 7 + m * 7) * 4,
            transcendentals=n * m,
        ),
        interpret=interpret,
    )(scalars, ty, target, weights4)

    p1 = acc[:, 0] * moving_mask
    px = acc[:, 1:4] * moving_mask[:, None]
    n_valid = jnp.sum(target_mask)
    err = (
        -jnp.sum(jnp.log(denom) * target_mask)
        + 3.0 * n_valid * jnp.log(sigma2) / 2.0
    )
    return Sufficient(p1=p1, pt1=pt1, px=px, error=err)
