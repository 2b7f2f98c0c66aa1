"""Real-loop A/B of the hier NN candidate width at 100k: production
l_budget=256 vs the sweep's winner 160 (stage_100k sweep: table 4.2 vs
6.2 ms, rescore 8.5 vs 9.2, counts max 146 < 160).  Measures the FULL
icp_register steady-state iteration like bench_report does.
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

import tpuslam.ops.nn_hier as nn_hier
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
    normalize_cloud,
)

N = 102_400
ITERS = 50


def measure(tag):
    from tpuslam.algorithms.icp import icp_register

    pts = normalize_cloud(
        load_cloud(f"synthetic://{N}").astype(np.float64), 10.0
    ).astype(np.float32)
    rng = np.random.Generator(np.random.PCG64(7))
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(N)].astype(np.float32)
    cb, ca = pad_cloud(pts), pad_cloud(moved)

    def run(i):
        res = icp_register(
            cb._replace(points=cb.points * (1.0 + 1e-5 * i)), ca,
            max_iterations=ITERS, max_distance_squared=1e6,
            eps=0.0, divergence_guard=False,
        )
        return res.error

    float(run(jnp.float32(0)))
    best = 1e9
    for rep in range(1, 4):
        t0 = time.perf_counter()
        e = float(run(jnp.float32(rep)))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    ms = best / ITERS * 1000
    print(
        f"{tag}: {ms:.2f} ms/iter ({1000.0/ms:.1f} it/s) err={e:.6f}",
        flush=True,
    )


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    float(jnp.sum(jnp.ones((8, 128))))
    orig = nn_hier.auto_tile_params
    measure("l_budget=256 (production)")

    def patched(m):
        g, gsrc, l = orig(m)
        return g, gsrc, (160 if l == 256 else l)

    nn_hier.auto_tile_params = patched
    # icp.py from-imports the symbol inside the function body, so the
    # patch takes effect on the next TRACE — clear the jit cache so the
    # second measure actually retraces
    jax.clear_caches()
    measure("l_budget=160 (sweep winner)")


if __name__ == "__main__":
    main()
