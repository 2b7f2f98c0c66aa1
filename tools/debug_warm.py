"""Diagnose the warm-start NN path on TPU: per-iteration overflow flag,
max displacement, admissible tile counts, and per-call timings of the
dense vs sparse kernels at 100k."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.types import Cloud, pad_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)
from tpuslam.ops.nn_spatial import (
    nearest_neighbors_spatial,
    pick_blocks,
    prepare_target,
)
from tpuslam.ops.spatial import (
    morton_permutation,
    select_candidates_warm,
    tile_bounds,
)
from tpuslam.ops.procrustes import weighted_procrustes
from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

N = 102_400


def read(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def main():
    rng = np.random.Generator(np.random.PCG64(666))
    before = (rng.random((N, 3), dtype=np.float64) * 10.0).astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    after = (before @ r.T + t)[rng.permutation(N)].astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)

    mask_s = cb.mask()
    perm_s = morton_permutation(cb.points, mask_s)
    src = cb.points[perm_s]
    src_mask = mask_s[perm_s]
    target = prepare_target(ca.points, ca.mask(), ca.count)
    bn, bm = pick_blocks(src.shape[0], ca.points.shape[0])
    print(f"bn={bn} bm={bm} Ts={src.shape[0]//bn} Tt={ca.points.shape[0]//bm}")

    R = jnp.eye(3)
    T = jnp.zeros(3)
    prev_dist = None
    prev_transformed = None

    for it in range(12):
        transformed = src @ R.T + T
        if prev_dist is None:
            idx, dist = nearest_neighbors_pallas(
                transformed, target.original_points, target.count
            )
            path = "dense(first)"
            n_adm = -1
        else:
            delta = jnp.linalg.norm(transformed - prev_transformed, axis=-1)
            ub_point = (jnp.sqrt(prev_dist) + delta) ** 2
            ub_point = ub_point * 1.00001 + 1e-6
            ub_point = jnp.where(src_mask > 0, ub_point, 0.0)
            ub_tile = jnp.max(ub_point.reshape(-1, bn), axis=1)
            sb = tile_bounds(transformed, src_mask, bn)
            cand, overflow = select_candidates_warm(
                sb, target.bounds, ub_tile, 32
            )
            n_adm = float(jnp.mean(jnp.sum(cand >= 0, axis=1)))
            path = "OVERFLOW->dense" if bool(overflow) else "sparse"
            idx, dist = nearest_neighbors_spatial(
                transformed, src_mask, target,
                warm=(prev_dist, delta),
            )
            print(f"  it{it}: mean admissible tiles {n_adm:.1f}, "
                  f"max delta {float(jnp.max(delta)):.4f}")
        w = jnp.logical_and(dist < 1e18, src_mask > 0).astype(jnp.float32)
        matched = ca.points[idx]
        r_step, t_step = weighted_procrustes(transformed, matched, w)
        R = r_step @ R
        T = r_step @ T + t_step
        err = read(jnp.sum(jnp.sum((matched - (src @ R.T + T)) ** 2, -1) * w)
                   / jnp.maximum(jnp.sum(w), 1.0))
        print(f"it{it}: {path:16s} err={err:.6f}")
        prev_dist = dist
        prev_transformed = transformed

    # timings: dense vs one sparse call with converged-state warm bounds
    def timeit(fn, reps=5):
        read(fn(0))
        t0 = time.perf_counter()
        out = None
        for i in range(1, reps + 1):
            out = fn(i)
        read(out)
        return (time.perf_counter() - t0) / reps

    pert = jax.jit(lambda x, i: x * (1.0 + 1e-5 * i))

    def run_dense(i):
        _, d = nearest_neighbors_pallas(
            pert(transformed, jnp.float32(i)), target.original_points,
            target.count,
        )
        return d

    print(f"dense NN: {timeit(run_dense)*1e3:.2f} ms")

    delta = jnp.linalg.norm(transformed - prev_transformed, axis=-1)

    def run_sparse(i):
        _, d = nearest_neighbors_spatial(
            pert(transformed, jnp.float32(i)), src_mask, target,
            warm=(prev_dist, delta),
        )
        return d

    print(f"warm sparse NN: {timeit(run_sparse)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
