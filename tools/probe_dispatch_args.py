"""Why does a warm cpd_register dispatch cost ~3 s more than its
compute at 376k?  Bisect: same program, inputs passed as (1) jit
arguments, (2) outer-jit closure constants (probe_split_struct V4
style, which measured 0.28 s/iter), (3) jit arguments but donated.
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

from tpuslam.algorithms.cpd import _morton_sort_cloud, cpd_register
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)

SIZE = 376_401


def main():
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    rng = np.random.Generator(np.random.PCG64(666))
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(SIZE)].astype(np.float32)
    print(f"backend={jax.default_backend()}", flush=True)
    float(jnp.sum(jnp.ones((8, 128))))

    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
        assume_sorted=True,
    )
    cb_s = _morton_sort_cloud(pad_cloud(pts))
    ca_s = _morton_sort_cloud(pad_cloud(moved))
    jax.block_until_ready((cb_s.points, ca_s.points))

    # --- (1) direct call, clouds as jit arguments ---
    res = cpd_register(cb_s, ca_s, max_iterations=3, **common)
    float(res.error)  # warm
    cb_s1 = cb_s._replace(points=cb_s.points * (1.0 + 1e-5))
    jax.block_until_ready(cb_s1.points)
    t0 = time.perf_counter()
    res = cpd_register(cb_s1, ca_s, max_iterations=3, **common)
    e = float(res.error)
    dt = time.perf_counter() - t0
    print(f"(1) args dispatch: {dt:.3f} s for 3 iters (err={e:.5f})",
          flush=True)

    # repeat to see variance
    cb_s1b = cb_s._replace(points=cb_s.points * (1.0 + 2e-5))
    jax.block_until_ready(cb_s1b.points)
    t0 = time.perf_counter()
    res = cpd_register(cb_s1b, ca_s, max_iterations=3, **common)
    e = float(res.error)
    print(f"(1b) args dispatch again: {time.perf_counter()-t0:.3f} s",
          flush=True)

    # --- (2) closure constants under an outer jit (V4 style) ---
    @jax.jit
    def v4(p):
        res = cpd_register(
            cb_s._replace(points=cb_s.points * (1.0 + p)), ca_s,
            max_iterations=3, **common
        )
        return res.error

    float(v4(jnp.float32(0.0)))  # warm
    t0 = time.perf_counter()
    e = float(v4(jnp.float32(1e-5)))
    dt = time.perf_counter() - t0
    print(f"(2) closure dispatch: {dt:.3f} s for 3 iters (err={e:.5f})",
          flush=True)

    # --- (3) outer jit with clouds as ARGUMENTS (not closure) ---
    @jax.jit
    def v5(bp, ap):
        res = cpd_register(
            cb_s._replace(points=bp), ca_s._replace(points=ap),
            max_iterations=3, **common
        )
        return res.error

    float(v5(cb_s.points, ca_s.points))  # warm
    bp = cb_s.points * (1.0 + 3e-5)
    jax.block_until_ready(bp)
    t0 = time.perf_counter()
    e = float(v5(bp, ca_s.points))
    dt = time.perf_counter() - t0
    print(f"(3) outer-jit args dispatch: {dt:.3f} s (err={e:.5f})",
          flush=True)


if __name__ == "__main__":
    main()
