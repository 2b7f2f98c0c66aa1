"""Nearest-neighbor correspondence search — the ICP hot loop.

TPU-native replacement for the reference's brute-force NN
(CPU: ``common.cpp:399-515``; CUDA kernel ``FindCorrespondences``,
``cudacommon.cu:57-77``): a blocked ``|a|^2 + |b|^2 - 2 a.b`` argmin.  The
``-2 a.b`` term rides the MXU; the running (min, argmin) accumulates across
target tiles.  Tie-breaking matches the reference: the FIRST (lowest) target
index wins (strict ``<`` scan, ``common.cpp:416``).

Two implementations behind one signature:

* ``nearest_neighbors_ref`` — chunked jnp (XLA-fused); the behavioral oracle
  and CPU-test path.
* ``pallas_nn.nearest_neighbors_pallas`` — the Pallas kernel (used on TPU).

Invalid target rows (index >= count) never win; if a source row is padding,
its result is arbitrary — callers mask by the source validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BIG = jnp.float32(3.4e38)


def _chunk_nn(
    src_chunk: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_invalid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # exact f32 per-coordinate form, same value and accumulation order as
    # the Pallas kernel so argmins agree bitwise.  The algebraic shortcut
    # |a|^2+|b|^2-2ab cancels catastrophically (NN distances are far below
    # the norms) and near-tie argmins flip ~10-20% at realistic densities
    # between formulations — the formulation IS the contract.
    d = (src_chunk[:, 0:1] - tgt[:, 0][None, :]) ** 2
    d += (src_chunk[:, 1:2] - tgt[:, 1][None, :]) ** 2
    d += (src_chunk[:, 2:3] - tgt[:, 2][None, :]) ** 2
    d = jnp.where(tgt_invalid[None, :], BIG, d)
    idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    return idx, best


def chunked_nn(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_invalid: jnp.ndarray,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``_chunk_nn`` over fixed source chunks so the (chunk, M) distance
    tile stays bounded regardless of N.  Shared by the oracle below and
    the per-shard search in ``tpuslam.parallel.nn``."""
    n = src.shape[0]
    if n <= chunk:
        return _chunk_nn(src, tgt, tgt_invalid)
    pad = (-n) % chunk
    src_p = jnp.pad(src, ((0, pad), (0, 0)))
    src_c = src_p.reshape(n // chunk + (1 if pad else 0), chunk, 3)
    idx, dist = jax.lax.map(lambda s: _chunk_nn(s, tgt, tgt_invalid), src_c)
    return idx.reshape(-1)[:n], dist.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbors_ref(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_count: jnp.ndarray,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each source row, the index and squared distance of the nearest
    valid target row.  ``src``: f32[N,3], ``tgt``: f32[M,3] (padded),
    ``tgt_count``: i32[] count of valid targets.  Returns (i32[N], f32[N]).

    No-match contract (zero valid targets): ``(idx=0, dist=BIG)`` —
    argmin over an all-``BIG`` row.  The Pallas kernels normalize to the
    same values.
    """
    m = tgt.shape[0]
    tgt_invalid = jnp.arange(m, dtype=jnp.int32) >= tgt_count
    return chunked_nn(src, tgt, tgt_invalid, chunk)


@jax.custom_batching.custom_vmap
def _nn_pallas_auto(
    src: jnp.ndarray, tgt: jnp.ndarray, tgt_count: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas NN with a custom vmap rule: a ``jax.vmap`` over pairs
    (batched registration) lowers to the single 3-D-grid batched kernel
    instead of failing to batch the pallas_call.  Interpret mode is
    selected by backend so the same call sites test on CPU."""
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

    return nearest_neighbors_pallas(
        src, tgt, tgt_count, interpret=jax.default_backend() != "tpu"
    )


@_nn_pallas_auto.def_vmap
def _nn_pallas_vmap(axis_size, in_batched, src, tgt, tgt_count):
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas_batch

    sb, tb, cb = in_batched
    if not sb:
        src = jnp.broadcast_to(src, (axis_size,) + src.shape)
    if not tb:
        tgt = jnp.broadcast_to(tgt, (axis_size,) + tgt.shape)
    count = jnp.asarray(tgt_count, jnp.int32).reshape(-1)
    if not cb:
        count = jnp.broadcast_to(count, (axis_size,))
    idx, dist = nearest_neighbors_pallas_batch(
        src, tgt, count, interpret=jax.default_backend() != "tpu"
    )
    return (idx, dist), (True, True)


def nearest_neighbors(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_count: jnp.ndarray,
    use_pallas: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatching front: Pallas kernel on TPU (batched kernel under
    ``jax.vmap`` via the custom-vmap rule), chunked jnp elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return _nn_pallas_auto(src, tgt, tgt_count)
    return nearest_neighbors_ref(src, tgt, tgt_count)
