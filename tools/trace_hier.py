"""Trace + benchmark the warm-start hierarchical NN on TPU at 100k.

Part 1 traces per-iteration decisions over a real ICP trajectory
(sparse arm vs dense fallback, candidate counts).  Part 2 measures the
honest in-loop steady state: a jitted 50-iteration ICP run (axon relay
rules: distinct inputs per rep, device-value read brackets the timing).
"""

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

from tpuslam.core.types import pad_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)
from tpuslam.algorithms.icp import icp_register

N = 102_400
ITERS = 50


def read(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def make_pair(rng):
    before = (rng.random((N, 3), dtype=np.float64) * 10.0).astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    after = (before @ r.T + t)[rng.permutation(N)].astype(np.float32)
    return pad_cloud(before), pad_cloud(after)


def trace(cb, ca):
    from tpuslam.ops.nn_hier import (
        hier_state_init,
        nearest_neighbors_hier,
        prepare_hier_target,
    )
    from tpuslam.ops.procrustes import weighted_procrustes
    from tpuslam.ops.spatial import morton_permutation

    mask_s = cb.mask()
    perm_s = morton_permutation(cb.points, mask_s)
    src = cb.points[perm_s]
    src_mask = mask_s[perm_s]
    target = prepare_hier_target(ca.points, ca.mask(), ca.count)
    state = hier_state_init(src.shape[0])

    @jax.jit
    def step(rot, trans, state):
        transformed = src @ rot.T + trans
        idx, dist, state = nearest_neighbors_hier(
            transformed, src_mask, target, state
        )
        matched = ca.points[idx % ca.points.shape[0]]
        rot_s, trans_s = weighted_procrustes(transformed, matched, src_mask)
        return rot_s @ rot, rot_s @ trans + trans_s, state, dist

    rot, trans = jnp.eye(3), jnp.zeros(3)
    r0, t0, s0, d0 = step(rot, trans, state)
    read(d0)
    print("trace compiled", flush=True)
    for i in range(25):
        t0w = time.perf_counter()
        rot, trans, state, dist = step(rot, trans, state)
        read(dist)
        dt = (time.perf_counter() - t0w) * 1e3
        sparse = bool(np.asarray(state.sparse))
        print(
            f"it {i:2d}  {dt:7.2f} ms  sparse={sparse}"
            f"  err~{float(jnp.sum(dist * src_mask) / jnp.sum(src_mask)):.5f}",
            flush=True,
        )


def bench_inloop(cb, ca):
    for use_spatial in (True, False):
        fn = jax.jit(
            lambda b, a, us=use_spatial: icp_register(
                b, a, max_iterations=ITERS, eps=0.0, use_spatial=us
            )
        )
        res = fn(cb, ca)
        read(res.error)  # compile + settle
        reps = 3
        t0 = time.perf_counter()
        for i in range(1, reps + 1):
            # distinct inputs each rep (relay may dedupe identical work)
            pts = cb.points * jnp.float32(1.0 + 1e-5 * i)
            res = fn(cb._replace(points=pts), ca)
        read(res.error)
        dt = (time.perf_counter() - t0) / reps
        it = int(res.iterations)
        print(
            f"spatial={use_spatial} iters={it}: {dt*1e3:.1f} ms/call = "
            f"{it/dt:.1f} it/s ({dt*1e3/it:.2f} ms/iter)",
            flush=True,
        )


def main():
    rng = np.random.Generator(np.random.PCG64(666))
    cb, ca = make_pair(rng)
    trace(cb, ca)
    bench_inloop(cb, ca)


if __name__ == "__main__":
    main()
