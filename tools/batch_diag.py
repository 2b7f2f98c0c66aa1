"""Localize the 16x16k batched-vs-solo ICP gap (bench_report's
``batch_vs_solo_speedup`` = 0.87): time the batched NN kernel (B=16,
one 3-D-grid launch) against the same 16 pairs pushed through the B=1
kernel inside ONE jitted program, then time a full vmapped ICP
iteration against a scan-of-solo-iterations.  Distinguishes "the 3-D
grid kernel is slower" from "the vmapped surrounding ops (gather,
procrustes) are slower".

Run on the TPU: ``python tools/batch_diag.py``.
"""

from __future__ import annotations

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

    read_scalar(jnp.sum(jnp.ones((8, 128))))
    print(f"backend={jax.default_backend()}", flush=True)

    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas_batch

    b, n = 16, (int(sys.argv[1]) if len(sys.argv) > 1 else 16_384)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((b, n, 3), dtype=np.float32) * 10)
    tgt = jnp.asarray(rng.random((b, n, 3), dtype=np.float32) * 10)
    counts = jnp.full((b,), n, jnp.int32)

    @jax.jit
    def run_batched(s):
        idx, dist = nearest_neighbors_pallas_batch(s, tgt, counts)
        return dist.sum()

    @jax.jit
    def run_b1_loop(s):
        total = jnp.float32(0)
        for p in range(b):
            _, dist = nearest_neighbors_pallas_batch(
                s[p : p + 1], tgt[p : p + 1], counts[p : p + 1]
            )
            total = total + dist.sum()
        return total

    dt_b = timeit(lambda i: run_batched(src * (1.0 + 1e-5 * i)), reps=3)
    dt_1 = timeit(lambda i: run_b1_loop(src * (1.0 + 1e-5 * i)), reps=3)
    print(f"NN kernel  B=16 grid: {dt_b*1000:8.2f} ms")
    print(f"NN kernel  16x B=1  : {dt_1*1000:8.2f} ms  "
          f"(batched/loop = {dt_b/dt_1:.3f})")

    # full registrations through the production entries, both inside ONE
    # jitted program, fixed 20 iterations: the vmapped while_loop vs a
    # python loop of solo icp_register bodies (eliminates per-dispatch
    # overhead from the comparison, unlike bench_report's solo arm)
    from tpuslam.algorithms.batch import icp_register_batch
    from tpuslam.algorithms.icp import icp_register
    from tpuslam.core.types import Cloud

    kw = dict(
        eps=0.0, max_distance_squared=1e18, max_iterations=20,
        divergence_guard=False,
    )

    def run_batch(s):
        # unroll=False: measure the VMAPPED lowering explicitly (the
        # auto crossover would otherwise pick unrolled at 16k and this
        # line would no longer measure what it labels); dense NN
        return icp_register_batch(
            Cloud(s, counts), Cloud(tgt, counts), unroll=False,
            use_spatial=False, **kw
        ).error.sum()

    def run_batch_hier(s):
        # the r3 vmapped-HIER lowering (custom-vmap batched kernels)
        return icp_register_batch(
            Cloud(s, counts), Cloud(tgt, counts), unroll=False,
            use_spatial=True, **kw
        ).error.sum()

    @jax.jit
    def run_loop(s):
        total = jnp.float32(0)
        for p in range(b):
            r = icp_register(
                Cloud(s[p], counts[p]), Cloud(tgt[p], counts[p]),
                use_pallas=True, use_spatial=False, **kw
            )
            total = total + r.error
        return total

    @jax.jit
    def run_loop_hier(s):
        total = jnp.float32(0)
        for p in range(b):
            r = icp_register(
                Cloud(s[p], counts[p]), Cloud(tgt[p], counts[p]),
                use_pallas=None, use_spatial=None, **kw
            )
            total = total + r.error
        return total

    dt_v = timeit(lambda i: run_batch(src * (1.0 + 1e-5 * i)), reps=3)
    dt_vh = timeit(lambda i: run_batch_hier(src * (1.0 + 1e-5 * i)), reps=3)
    dt_l = timeit(lambda i: run_loop(src * (1.0 + 1e-5 * i)), reps=3)
    dt_h = timeit(lambda i: run_loop_hier(src * (1.0 + 1e-5 * i)), reps=3)
    print(f"ICP 20it  vmapped batch    : {dt_v*1000:8.2f} ms")
    print(f"ICP 20it  one-jit loop     : {dt_l*1000:8.2f} ms  "
          f"(vmap/loop = {dt_v/dt_l:.3f})")
    print(f"ICP 20it  one-jit loop hier: {dt_h*1000:8.2f} ms  "
          f"(vmap/hier = {dt_v/dt_h:.3f})")
    print(f"ICP 20it  vmapped batch HIER:  {dt_vh*1000:8.2f} ms  "
          f"(vmap-hier/loop-hier = {dt_vh/dt_h:.3f}")


if __name__ == "__main__":
    main()
