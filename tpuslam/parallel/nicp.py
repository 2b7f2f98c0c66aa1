"""Multi-chip NICP: candidate enumeration replicated, exact rescoring
sharded.

NICP's heavy phases are (a) the two masked 3x3 scatter matrices — one
matmul over N each, embarrassingly shardable via ``psum`` of per-shard
partials — and (b) the exact error rescoring, a subcloud-NN search against
the full target cloud, which reuses the sharded argmin combine from
``tpuslam.parallel.nn``.  The 4 sign candidates (see
``tpuslam.algorithms.nicp``) are scored with the target sharded along the
``points`` axis; everything else is replicated 3x3 algebra.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpuslam.algorithms.icp import RegistrationResult
from tpuslam.algorithms.nicp import (
    MAX_DISTANCE_FOR_COMPARISON,
    _enumerate_candidates,
    masked_centroid,
    principal_axes,
)
from tpuslam.core.types import Cloud, RigidTransform
from tpuslam.parallel.mesh import POINTS_AXIS
from tpuslam.parallel.nn import sharded_nn_combine
from tpuslam.ops.geometry import transform_points

BIG = jnp.float32(3.4e38)


@lru_cache(maxsize=16)
def _build(mesh: Mesh):
    axis = POINTS_AXIS

    def run(before_pts, mask_b, tgt_shard, tgt_count, sub_idx):
        # replicated moments of the moving cloud (shared helpers)
        mu_b = masked_centroid(before_pts, mask_b)
        u_b, _ = principal_axes(before_pts, mask_b)

        # sharded moments of the target cloud (psum'd partials)
        shard_size = tgt_shard.shape[0]
        offset = jax.lax.axis_index(axis) * shard_size
        gidx = offset + jnp.arange(shard_size, dtype=jnp.int32)
        mask_a = (gidx < tgt_count).astype(jnp.float32)
        na = jnp.maximum(jax.lax.psum(jnp.sum(mask_a), axis), 1.0)
        mu_a = (
            jax.lax.psum(
                jnp.sum(tgt_shard * mask_a[:, None], axis=0), axis
            )
            / na
        )
        xa = (tgt_shard - mu_a) * mask_a[:, None]
        cov_a = jax.lax.psum(
            jnp.einsum(
                "nr,nc->rc", xa, xa, precision=jax.lax.Precision.HIGHEST
            ),
            axis,
        )
        # descending eigenbasis, same convention as principal_axes
        _, ua = jnp.linalg.eigh(cov_a)
        u_a = ua[:, ::-1]

        cands = _enumerate_candidates(u_b, u_a, mu_b, mu_a)
        rots, trans, proper = (
            cands.rotations, cands.translations, cands.proper
        )

        subcloud = before_pts[sub_idx]
        sub_mask = mask_b[sub_idx]

        def exact_error(r, t):
            transformed = transform_points(subcloud, r, t)
            _, dist, _ = sharded_nn_combine(
                transformed, tgt_shard, tgt_count, axis
            )
            w = jnp.logical_and(
                dist < MAX_DISTANCE_FOR_COMPARISON, sub_mask > 0
            ).astype(jnp.float32)
            return jnp.sum(dist * w) / jnp.maximum(jnp.sum(w), 1.0)

        errors = jax.vmap(exact_error)(rots, trans)
        errors = errors + jnp.where(proper, 0.0, BIG)
        best = jnp.argmin(errors)
        n_scored = jnp.sum(proper.astype(jnp.int32))
        return rots[best], trans[best], n_scored, errors[best]

    sharded = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(), P(POINTS_AXIS, None), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def nicp_register_sharded(
    before: Cloud,
    after: Cloud,
    mesh: Mesh,
    subcloud_size: int = 1000,
    seed: int = 0,
) -> RegistrationResult:
    """``before`` replicated, ``after`` sharded along the points axis."""
    import numpy as np

    k = min(subcloud_size, before.padded_size)
    # host-side deterministic subcloud choice (common.cpp:25-37)
    rng = np.random.Generator(np.random.PCG64(seed))
    n_valid = int(before.count)
    if n_valid > k:
        sub_idx = rng.permutation(n_valid)[:k].astype(np.int32)
    else:
        sub_idx = np.arange(k, dtype=np.int32)
    fn = _build(mesh)
    rotation, translation, n_scored, error = fn(
        before.points,
        before.mask(),
        after.points,
        after.count,
        jnp.asarray(sub_idx),
    )
    return RegistrationResult(
        transform=RigidTransform(
            rotation=rotation,
            translation=translation,
            scale=jnp.float32(1.0),
        ),
        iterations=n_scored,
        error=error,
    )
