"""Shared jittable geometry math: transforms, masked statistics, MSE.

These are the jnp equivalents of the reference's shared math in
``source/common/common.cpp`` — trivially fused by XLA, so no hand kernels.
Every reduction takes a validity mask so padded rows never perturb results
(SURVEY §7 "Padding vs statistics").
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_mean(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Center of mass of the valid points (``common.cpp:281-284``)."""
    w = mask.astype(points.dtype)
    total = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(points * w[:, None], axis=0) / total


def masked_mse(
    diff: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Mean over valid rows of the squared row norms
    (the elementwise overload, ``common.cpp:270-279``)."""
    w = mask.astype(diff.dtype)
    count = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(jnp.sum(diff * diff, axis=-1) * w) / count


def mse_between(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean squared distance between row-aligned clouds."""
    return masked_mse(a - b, mask)


def transform_points(
    points: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
    scale=1.0,
) -> jnp.ndarray:
    """``p -> scale * (R @ p) + t`` (``common.cpp:39-55``).

    Exact f32 by construction: a ``[N,3] @ [3,3]`` matmul at default
    precision takes the TPU's bf16 MXU path (~2^-8 relative coordinate
    error — ~0.04 units at spread 10), which measurably biased every
    registration's optimum (~0.01-0.04 translation error per pair,
    6x trajectory drift in sequence odometry; tools/probe_seq_seed.py
    --dense).  The per-coordinate FMA form runs exact f32 on the VPU
    and fuses into the downstream kernels."""
    x = points[..., 0]
    y = points[..., 1]
    z = points[..., 2]

    def entry(r, c):
        # trailing length-1 axis so explicitly-batched rotations
        # broadcast against the points' row axis
        return rotation[..., r, c][..., None]

    out = jnp.stack(
        [
            x * entry(0, 0) + y * entry(0, 1) + z * entry(0, 2),
            x * entry(1, 0) + y * entry(1, 1) + z * entry(1, 2),
            x * entry(2, 0) + y * entry(2, 1) + z * entry(2, 2),
        ],
        axis=-1,
    )
    return scale * out + translation


def squared_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs squared distances ``f32[N, M]`` via the MXU-friendly
    expansion ``|a|^2 + |b|^2 - 2 a.b``."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)  # [N, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T  # [1, M]
    cross = a @ b.T  # [N, M] — MXU
    return a2 + b2 - 2.0 * cross
