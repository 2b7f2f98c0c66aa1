"""Pallas TPU kernel: fused hier-NN bound pass.

Computes, per source group of ``gsrc`` Morton-sorted rows, the
admissible-target-tile row ``adm[i, :C]`` of ``tpuslam.ops.nn_hier`` —
the hi/lo-split MXU center-distance matmul, the per-source geometric /
warm upper bounds, and the admissibility compare — WITHOUT ever
materializing the ``[N, C]`` distance matrix in HBM.  The jnp
formulation pays ~4-6 HBM passes over ``[N, C]`` f32 (~2.1 ms/iter at
100k, tools/inloop_stages.py); here everything lives in one VMEM block
per group and HBM sees only ``saug`` in and ``adm`` out (~0.4 ms).

Rigor, not bit-equality, is the contract (exactness of the overall NN
result needs admission to be a SUPERSET of every global-minimum row's
tile, which the inflated bounds guarantee; see
``nn_hier.nearest_neighbors_hier``): the kernel evaluates the same
expressions as the jnp path, but nothing downstream depends on the two
arms admitting identical sets.

Layout: sources ride the sublanes here (each step owns one group), the
C tile-centers ride the lanes — ``dc2 = saug @ caug`` lands [gsrc, C]
directly off the MXU, the per-source lane-min gives the geometric
bound once per group, and the final any-over-group is a free sublane
reduction.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuslam.core.types import round_up

BIG = 3.4e38


def _bound_kernel(eps_ref, warm_ref, saug_ref, aux_ref, caug_ref,
                  radii_ref, adm_ref):
    eps = eps_ref[0, 0]
    dc2 = jax.lax.dot_general(
        saug_ref[:], caug_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + aux_ref[:, 0:1]  # [gsrc, C] — s2 column rides aux col 0
    radii = radii_ref[:]  # [1, C]
    ub = jnp.min(
        jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii, axis=1,
        keepdims=True,
    )  # [gsrc, 1]

    ub = jnp.where(
        warm_ref[0, 0] > 0, jnp.minimum(ub, aux_ref[:, 1:2]), ub
    )
    ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
    thresh = (ub + radii) ** 2 + eps
    adm = jnp.logical_and(dc2 <= thresh, aux_ref[:, 2:3] > 0.0)
    adm_ref[:] = jnp.max(adm.astype(jnp.int32), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("gsrc", "interpret"))
def bound_pass_pallas(
    saug: jnp.ndarray,
    aux: jnp.ndarray,
    caug: jnp.ndarray,
    radii: jnp.ndarray,
    eps: jnp.ndarray,
    warm: jnp.ndarray,
    gsrc: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """``adm_tile`` bool[N//gsrc, C].

    ``saug``: bf16[N, 12] hi/lo-split source operand (nn_hier layout);
    ``aux``: f32[N, 4] columns (s2, warm upper bound, valid flag, 0);
    ``caug``: bf16[12, C] target-tile operand; ``radii``: f32[C]
    inflated tile radii; ``eps``: f32[] rigorous dc2 error bound;
    ``warm``: bool[] warm-bound validity.
    """
    n = saug.shape[0]
    c = caug.shape[1]
    assert n % gsrc == 0
    ts = n // gsrc
    # pad the tile axis to full lanes; padded columns get dc2 ~ BIG
    # (via caug's c2 rows) and radius 0, so they are never admissible
    c_pad = round_up(c, 128)
    # the per-step [rows, C] block must fit VMEM with its temporaries;
    # 512x2560 f32 (~5.2 MB) is measured-good at 1.3M, so cap the block
    # at ~6 MB and let the wrapper emit finer rows, re-grouped below
    bs = gsrc
    while bs > 128 and bs * c_pad * 4 > 6 * 1024 * 1024:
        bs //= 2
    assert n % bs == 0 and gsrc % bs == 0
    if c_pad != c:
        pad = jnp.zeros((12, c_pad - c), caug.dtype)
        pad = pad.at[9, :].set(jnp.bfloat16(BIG))  # c2_hi row
        caug = jnp.concatenate([caug, pad], axis=1)
        radii = jnp.concatenate(
            [radii, jnp.zeros((c_pad - c,), radii.dtype)]
        )

    nb = n // bs
    adm = pl.pallas_call(
        _bound_kernel,
        grid_spec=pl.GridSpec(
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bs, 12), lambda i: (i, 0)),
                pl.BlockSpec((bs, 4), lambda i: (i, 0)),
                pl.BlockSpec((12, c_pad), lambda i: (0, 0)),
                pl.BlockSpec((1, c_pad), lambda i: (0, 0)),
            ],
            # a (1, c_pad) block of a [nb, c_pad] array violates the
            # sublane-divisibility rule; a [1, nb*c_pad] lane-major
            # output with lane-offset blocks is layout-legal
            out_specs=pl.BlockSpec((1, c_pad), lambda i: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((1, nb * c_pad), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * 12 * c_pad + 8 * n * c_pad,
            bytes_accessed=n * 12 * 2 + n * 16 + nb * c_pad * 4,
            transcendentals=n * c_pad,  # the sqrt
        ),
        interpret=interpret,
    )(
        jnp.reshape(eps.astype(jnp.float32), (1, 1)),
        jnp.reshape(warm.astype(jnp.int32), (1, 1)),
        saug,
        aux,
        caug,
        radii.reshape(1, c_pad),
    )
    adm = adm.reshape(nb, c_pad)[:, :c] > 0
    if bs != gsrc:  # re-group fine row-blocks to gsrc granularity
        adm = jnp.any(adm.reshape(ts, gsrc // bs, c), axis=1)
    return adm


def _bound_kernel_batch(eps_ref, warm_ref, saug_ref, aux_ref, caug_ref,
                        radii_ref, adm_ref):
    p = pl.program_id(0)
    eps = eps_ref[p]
    dc2 = jax.lax.dot_general(
        saug_ref[0], caug_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + aux_ref[0, :, 0:1]  # [bs, C]
    radii = radii_ref[0]  # [1, C]
    ub = jnp.min(
        jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii, axis=1,
        keepdims=True,
    )
    ub = jnp.where(
        warm_ref[p] > 0, jnp.minimum(ub, aux_ref[0, :, 1:2]), ub
    )
    ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
    thresh = (ub + radii) ** 2 + eps
    adm = jnp.logical_and(dc2 <= thresh, aux_ref[0, :, 2:3] > 0.0)
    adm_ref[:] = jnp.max(adm.astype(jnp.int32), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("gsrc", "interpret"))
def bound_pass_pallas_batch(
    saug: jnp.ndarray,
    aux: jnp.ndarray,
    caug: jnp.ndarray,
    radii: jnp.ndarray,
    eps: jnp.ndarray,
    warm: jnp.ndarray,
    gsrc: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched bound pass: ``adm_tile`` bool[B, N//gsrc, C].

    ``saug`` bf16[B, N, 12], ``aux`` f32[B, N, 4], ``caug``
    bf16[B, 12, C], ``radii`` f32[B, C], ``eps`` f32[B], ``warm``
    bool[B] — per-pair scalars ride scalar prefetch, indexed by the
    batch grid coordinate."""
    b, n = saug.shape[0], saug.shape[1]
    c = caug.shape[2]
    assert n % gsrc == 0
    ts = n // gsrc
    c_pad = round_up(c, 128)
    if c_pad != c:
        pad = jnp.zeros((b, 12, c_pad - c), caug.dtype)
        pad = pad.at[:, 9, :].set(jnp.bfloat16(BIG))  # c2_hi row
        caug = jnp.concatenate([caug, pad], axis=2)
        radii = jnp.concatenate(
            [radii, jnp.zeros((b, c_pad - c), radii.dtype)], axis=1
        )
    bs = gsrc
    while bs > 128 and bs * c_pad * 4 > 6 * 1024 * 1024:
        bs //= 2
    assert n % bs == 0 and gsrc % bs == 0
    nb = n // bs

    adm = pl.pallas_call(
        _bound_kernel_batch,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nb),
            in_specs=[
                pl.BlockSpec((1, bs, 12), lambda p, i, e, w: (p, i, 0)),
                pl.BlockSpec((1, bs, 4), lambda p, i, e, w: (p, i, 0)),
                pl.BlockSpec((1, 12, c_pad), lambda p, i, e, w: (p, 0, 0)),
                pl.BlockSpec((1, 1, c_pad), lambda p, i, e, w: (p, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, c_pad), lambda p, i, e, w: (0, p * nb + i)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((1, b * nb * c_pad), jnp.int32),
        interpret=interpret,
    )(
        eps.astype(jnp.float32),
        warm.astype(jnp.int32),
        saug,
        aux,
        caug,
        radii.reshape(b, 1, c_pad),
    )
    adm = adm.reshape(b, nb, c_pad)[:, :, :c] > 0
    if bs != gsrc:
        adm = jnp.any(adm.reshape(b, ts, gsrc // bs, c), axis=2)
    return adm
