"""Post-refactor TPU revalidation: the unbatched Pallas wrappers now
delegate to the batched kernels at B=1 (r2 review dedup), which is on the
benchmark hot path (the hier NN's dense fallback and the CPD E-step).
This script re-measures exactly those arms against the recorded
``bench_report.json`` numbers so any lowering regression from the unit
leading grid dim is caught before the driver's bench run.

Run on the TPU: ``python tools/r2_revalidate.py``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ),
)

from bench_report import read_scalar, timeit  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # prime: a fresh relay worker can crash if its first dispatch is big
    read_scalar(jnp.sum(jnp.ones((8, 128))))
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")

    from tpuslam.algorithms.cpd import sigma_squared_init, uniform_constant
    from tpuslam.core.types import pad_cloud
    from tpuslam.kernels.pallas_cpd import cpd_estep_pallas
    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

    rng = np.random.Generator(np.random.PCG64(666))
    results = {}

    # --- dense NN kernel at 100k x 100k (recorded: nn_100k_ms = 46.0) ---
    n = 102_400
    src = (rng.random((n, 3), dtype=np.float64) * 10.0).astype(np.float32)
    tgt = (rng.random((n, 3), dtype=np.float64) * 10.0).astype(np.float32)
    cs, ct = pad_cloud(src), pad_cloud(tgt)

    def nn_run(i):
        idx, dist = nearest_neighbors_pallas(
            cs.points * (1.0 + 1e-5 * i), ct.points, ct.count
        )
        return dist

    dt = timeit(nn_run, reps=5)
    results["nn_100k_ms"] = round(dt * 1000, 2)
    print(f"nn_100k_ms = {dt * 1000:.2f} (recorded 46.0)")

    # --- CPD E-step at 20k x 20k (recorded: cpd_estep_20k_ms = 9.66) ---
    m = 20_480
    mov = (rng.random((m, 3), dtype=np.float64) * 10.0).astype(np.float32)
    targ = (rng.random((m, 3), dtype=np.float64) * 10.0).astype(np.float32)
    cm, cn = pad_cloud(mov), pad_cloud(targ)
    mm = (jnp.arange(cm.points.shape[0]) < cm.count).astype(jnp.float32)
    nm = (jnp.arange(cn.points.shape[0]) < cn.count).astype(jnp.float32)
    s2 = sigma_squared_init(cm.points, mm, cn.points, nm)
    const = uniform_constant(s2, 0.1, cm.count, cn.count)

    def estep_run(i):
        out = cpd_estep_pallas(
            cm.points * (1.0 + 1e-5 * i), mm, cn.points, nm,
            s2, const, jnp.asarray(False),
        )
        return out.error

    dt = timeit(estep_run, reps=5)
    results["cpd_estep_20k_ms"] = round(dt * 1000, 2)
    print(f"cpd_estep_20k_ms = {dt * 1000:.2f} (recorded 9.66)")

    # --- whole-loop ICP at 100k, hier default (recorded: 12.45 ms/iter) ---
    from tpuslam.algorithms.icp import icp_register
    from tpuslam.core.types import Cloud
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
    )

    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    after = (src @ r.T + t)[rng.permutation(n)].astype(np.float32)
    cb, ca = pad_cloud(src), pad_cloud(after)

    iters = 50

    def icp_run(i):
        return icp_register(
            Cloud(cb.points * (1.0 + 1e-5 * i), cb.count), ca,
            eps=0.0, max_distance_squared=1e18,
            max_iterations=iters, divergence_guard=False,
        ).error

    dt = timeit(icp_run, reps=3)
    results["icp_iter_100k_hier_ms"] = round(dt * 1000 / iters, 2)
    results["icp_iters_per_sec_100k"] = round(iters / dt, 2)
    print(
        f"icp_iter_100k_hier_ms = {dt * 1000 / iters:.2f} (recorded 12.45)"
        f" -> {iters / dt:.1f} iter/s (recorded 80.34)"
    )

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "bench_results", "r2_revalidate.json")
    with open(os.path.abspath(out), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
