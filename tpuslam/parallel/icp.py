"""Multi-chip ICP: the full while-loop jitted over a device mesh.

Same algorithm as ``tpuslam.algorithms.icp`` (homogeneous composition,
divergence guard, weight-masked Procrustes) with the NN hot loop sharded:
the target cloud lives split across devices, each iteration does one
per-shard argmin + two ``pmin`` / one ``psum`` collective, and everything
else (3x3 SVD, state update) runs replicated.  Per SURVEY §3.2's lesson,
nothing crosses the host boundary — the loop, collectives included,
compiles into one XLA program.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpuslam.algorithms.icp import FLT_MAX, ICPState, RegistrationResult
from tpuslam.core.types import Cloud, RigidTransform
from tpuslam.ops.procrustes import weighted_procrustes
from tpuslam.parallel.mesh import POINTS_AXIS
from tpuslam.parallel.nn import sharded_nn_combine


@lru_cache(maxsize=16)
def _build(mesh: Mesh, divergence_guard: bool):
    def loop(before_pts, src_mask, tgt_shard, tgt_count,
             eps, max_d2, max_iterations):
        def cond(s: ICPState):
            return jnp.logical_and(
                jnp.logical_not(s.done),
                jnp.logical_or(
                    max_iterations == -1, s.iterations < max_iterations
                ),
            )

        def body(s: ICPState) -> ICPState:
            transformed = before_pts @ s.rotation.T + s.translation
            _, dist, matched = sharded_nn_combine(
                transformed, tgt_shard, tgt_count
            )
            w = jnp.logical_and(dist < max_d2, src_mask > 0).astype(
                jnp.float32
            )
            n_corr = jnp.sum(w)
            no_corr = n_corr == 0

            r_step, t_step = weighted_procrustes(transformed, matched, w)
            r_new = r_step @ s.rotation
            t_new = r_step @ s.translation + t_step

            new_transformed = before_pts @ r_new.T + t_new
            diff = matched - new_transformed
            err = jnp.sum(jnp.sum(diff * diff, -1) * w) / jnp.maximum(
                n_corr, 1.0
            )

            converged = err < eps
            diverged = jnp.logical_and(
                jnp.asarray(divergence_guard), err > s.prev_error
            )
            # fail-fast on non-finite error (see algorithms/icp.py): a
            # NaN would otherwise spin the whole mesh forever at
            # max_iterations=-1
            non_finite = jnp.logical_not(jnp.isfinite(err))

            def pick(cur, new):
                return jnp.where(
                    jnp.logical_or(no_corr, diverged), cur, new
                )

            done = jnp.logical_or(
                jnp.logical_or(no_corr, non_finite),
                jnp.logical_or(converged, diverged),
            )
            keep = jnp.logical_not(done)
            return ICPState(
                rotation=pick(s.rotation, r_new),
                translation=pick(s.translation, t_new),
                error=pick(s.error, err),
                prev_error=jnp.where(keep, err, s.prev_error),
                iterations=jnp.where(done, s.iterations, s.iterations + 1),
                done=done,
            )

        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros((3,), dtype=jnp.float32)
        init = ICPState(
            rotation=eye, translation=zero,
            error=jnp.float32(1e5), prev_error=FLT_MAX,
            iterations=jnp.int32(0), done=jnp.asarray(False),
        )
        final = jax.lax.while_loop(cond, body, init)
        return final.rotation, final.translation, final.iterations, final.error

    sharded = jax.shard_map(
        loop,
        mesh=mesh,
        in_specs=(P(), P(), P(POINTS_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def icp_register_sharded(
    before: Cloud,
    after: Cloud,
    mesh: Mesh,
    eps: float = 1e-3,
    max_distance_squared: float = 1000.0,
    max_iterations: int = 50,
    divergence_guard: bool = True,
) -> RegistrationResult:
    """``before`` replicated, ``after`` sharded along the points axis
    (see ``tpuslam.parallel.mesh.shard_cloud``)."""
    fn = _build(mesh, divergence_guard)
    rotation, translation, iterations, error = fn(
        before.points,
        before.mask(),
        after.points,
        after.count,
        jnp.float32(eps),
        jnp.float32(max_distance_squared),
        jnp.int32(max_iterations),
    )
    return RegistrationResult(
        transform=RigidTransform(
            rotation=rotation,
            translation=translation,
            scale=jnp.float32(1.0),
        ),
        iterations=iterations,
        error=error,
    )
