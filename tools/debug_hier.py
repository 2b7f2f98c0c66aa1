"""Diagnose the hier NN path on TPU at 100k: per-ICP-iteration candidate
counts (max per source group), which tier would run, and kernel timings
for each arm."""

import os
import sys
import time
from functools import partial

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

from tpuslam.core.types import pad_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)
from tpuslam.ops.nn_hier import (
    _center_dc2,
    prepare_hier_target,
)
from tpuslam.ops.spatial import morton_permutation
from tpuslam.ops.procrustes import weighted_procrustes
from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas
from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

N = 102_400
G = 256
GSRC = 256


def read(x):
    return float(jnp.asarray(x).reshape(-1)[0])


@partial(jax.jit, static_argnames=())
def iteration_stats(transformed, src_mask, target, prev_target,
                    warm):
    dc2, eps = _center_dc2(transformed, target)
    radii = target.radii
    ub = jnp.min(jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii[None, :],
                 axis=1)
    delta = jnp.linalg.norm(transformed - prev_target, axis=-1)
    ub_warm = delta * 1.00001 + 1e-6
    ub = jnp.where(warm, jnp.minimum(ub, ub_warm), ub)
    ub = ub * 1.00001 + 1e-6
    c = dc2.shape[1]
    lb_ok = dc2 <= (ub[:, None] + radii[None, :]) ** 2 + eps
    ts = transformed.shape[0] // GSRC
    adm = jnp.logical_and(lb_ok, (src_mask > 0)[:, None])
    adm_tile = jnp.any(adm.reshape(ts, GSRC, c), axis=1)
    counts = jnp.sum(adm_tile, axis=1)
    per_src = jnp.sum(adm, axis=1)
    return (jnp.max(counts), jnp.mean(counts.astype(jnp.float32)),
            jnp.mean(per_src.astype(jnp.float32)), jnp.max(delta))


@jax.jit
def icp_step(transformed, src_points, after_pts, idx, dist, src_mask, R, T):
    w = jnp.logical_and(dist < 1e18, src_mask > 0).astype(jnp.float32)
    matched = after_pts[idx]
    r_step, t_step = weighted_procrustes(transformed, matched, w)
    return r_step @ R, r_step @ T + t_step


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
    target = prepare_hier_target(ca.points, ca.mask(), ca.count)

    R = jnp.eye(3)
    T = jnp.zeros(3)
    prev_target = jnp.zeros_like(src)
    warm = jnp.asarray(False)

    for it in range(14):
        transformed = src @ R.T + T
        cmax_t, cmean, psrc, dmax = iteration_stats(
            transformed, src_mask, target, prev_target, warm
        )
        idx, dist = nearest_neighbors_pallas(
            transformed, target.original_points, target.count
        )
        print(f"it{it:2d}: max_tiles={int(cmax_t):4d} "
              f"mean_tiles={float(cmean):7.1f} per_src={float(psrc):7.1f} "
              f"max_delta={float(dmax):8.4f}", flush=True)
        prev_target, warm = target.original_points[idx], jnp.asarray(True)
        # map sorted->orig target idx already original; gather matched
        R, T = icp_step(transformed, src, ca.points, idx, dist, src_mask,
                        R, T)

    # arm timings at the converged state
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
            target.count)
        return d

    print(f"dense NN:        {timeit(run_dense)*1e3:7.2f} ms")

    # bound pass alone
    @jax.jit
    def bounds_only(tr):
        dc2, eps = _center_dc2(tr, target)
        return jnp.max(dc2) + eps

    def run_bounds(i):
        return bounds_only(pert(transformed, jnp.float32(i)))

    print(f"bound pass:      {timeit(run_bounds)*1e3:7.2f} ms")

    # full hier call (warm, converged)
    from tpuslam.ops.nn_hier import HierState, nearest_neighbors_hier

    def run_hier(i, warm=True):
        _, d, _ = nearest_neighbors_hier(
            pert(transformed, jnp.float32(i)), src_mask, target,
            HierState(prev_target=prev_target, warm=jnp.asarray(warm),
                      sparse=jnp.asarray(False)),
        )
        return d

    print(f"hier NN (warm):  {timeit(run_hier)*1e3:7.2f} ms")

    def run_hier_cold(i):
        return run_hier(i, warm=False)

    print(f"hier NN (cold):  {timeit(run_hier_cold)*1e3:7.2f} ms")

    # candidate kernel alone at the L1 budget with synthetic table
    ts = src.shape[0] // GSRC
    cand = jnp.tile(jnp.arange(48, dtype=jnp.int32)[None, :], (ts, 1))

    def run_cand(i):
        _, d = nearest_neighbors_cand(
            pert(transformed, jnp.float32(i)), target.packed,
            target.count, cand, g=G, gsrc=GSRC)
        return d

    print(f"cand kernel L48: {timeit(run_cand)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
