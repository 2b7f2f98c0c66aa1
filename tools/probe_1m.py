"""Bisect the deterministic TPU worker crash at the 1.05M ICP rung.

Stages (each value-read verified; run one via argv[1]):
  prime  — tiny dispatch only
  dense  — standalone dense Pallas NN at the exact padded shape
  hier   — standalone hierarchical NN (rescore arm + overflow/dense arm)
  icp    — full icp_register at the exact test-41 ladder config
"""

from __future__ import annotations

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

import numpy as np


def main() -> int:
    stage = sys.argv[1] if len(sys.argv) > 1 else "icp"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1_050_000

    import jax
    import jax.numpy as jnp

    from tpuslam.core.types import pad_cloud

    # prime: the relayed worker's first dispatch in a fresh process has
    # crashed on large programs before; a tiny dispatch avoids it
    x = jnp.ones((8, 128), jnp.float32)
    print("prime:", float(jnp.sum(x)), flush=True)
    if stage == "prime":
        return 0

    rng = np.random.Generator(np.random.PCG64(41))
    pts = rng.random((size, 3), np.float32) * 10.0
    before = pad_cloud(pts)
    tgt = rng.random((size, 3), np.float32) * 10.0
    after = pad_cloud(tgt)
    print("padded:", before.points.shape, after.points.shape, flush=True)

    if stage == "dense":
        from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

        t0 = time.perf_counter()
        idx, dist = nearest_neighbors_pallas(
            before.points, after.points, after.count
        )
        print("dense:", int(idx[0]), float(dist[0]),
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        return 0

    if stage == "hier":
        from tpuslam.core.types import round_up
        from tpuslam.ops.nn_hier import (
            DEFAULT_G,
            DEFAULT_GSRC,
            hier_state_init,
            nearest_neighbors_hier,
            prepare_hier_target,
        )

        n0 = before.points.shape[0]
        m0 = after.points.shape[0]
        n_pad = round_up(n0, DEFAULT_GSRC)
        m_pad = round_up(m0, DEFAULT_G)
        b = jnp.pad(before.points, ((0, n_pad - n0), (0, 0)))
        bm = jnp.pad(before.mask(), (0, n_pad - n0))
        a = jnp.pad(after.points, ((0, m_pad - m0), (0, 0)))
        am = jnp.pad(after.mask(), (0, m_pad - m0))
        target = prepare_hier_target(a, am, after.count)
        state = hier_state_init(n_pad)
        t0 = time.perf_counter()
        idx, dist, state = nearest_neighbors_hier(b, bm, target, state)
        print("hier q1 (cold/dense arm):", int(idx[0]), float(dist[0]),
              bool(state.sparse), f"{time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        idx, dist, state = nearest_neighbors_hier(
            b * jnp.float32(1.0 + 1e-5), bm, target, state
        )
        print("hier q2 (warm/rescore arm):", int(idx[0]), float(dist[0]),
              bool(state.sparse), f"{time.perf_counter() - t0:.1f}s",
              flush=True)
        return 0

    if stage == "icp":
        from tpuslam.algorithms.icp import icp_register

        t0 = time.perf_counter()
        result = icp_register(
            before, after, eps=1e-5, max_distance_squared=10000.0,
            max_iterations=50,
        )
        print("icp:", np.asarray(result.transform.rotation)[0, 0],
              int(result.iterations),
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        return 0

    print(f"unknown stage {stage}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
