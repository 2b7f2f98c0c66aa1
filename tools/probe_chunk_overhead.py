"""Where do the 376k hybrid headline's seconds go?  Times (a) the bare
Morton sort, (b) each 3-iteration chunk dispatched the old way (sort
inside the program), (c) the new chunked driver (sort hoisted), and
(d) the same 15 iterations as ONE dispatch.  (cpd_large.json recorded
15.1 s wall while the E-steps sum to ~4.3 s.)
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

from tpuslam.algorithms.cpd import (
    CPDResume,
    _morton_sort_cloud,
    cpd_register,
    cpd_register_chunked,
)
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
    cb, ca = pad_cloud(pts), pad_cloud(moved)
    print(f"backend={jax.default_backend()}", flush=True)
    # prime the worker with a tiny program first
    float(jnp.sum(jnp.ones((8, 128))))

    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
    )

    # --- (a) bare Morton sort of one padded 376k cloud ---
    s0 = _morton_sort_cloud(cb)  # compile
    float(s0.points[0, 0])
    t0 = time.perf_counter()
    s1 = _morton_sort_cloud(
        cb._replace(points=cb.points * (1.0 + 1e-5))
    )
    float(s1.points[0, 0])
    print(f"morton sort 376k: {time.perf_counter() - t0:.3f} s", flush=True)

    # warm both chunk traces exactly like cpd_large.py
    float(
        cpd_register_chunked(cb, ca, max_iterations=4, chunk=3, **common)
        .error
    )

    cb_t = pad_cloud((pts * (1.0 + 1e-5)).astype(np.float32))

    # --- (b) per-chunk timing, OLD behavior (sort inside every chunk) ---
    resume = None
    total = 0
    t_all = time.perf_counter()
    for ci in range(5):
        t0 = time.perf_counter()
        res = cpd_register(
            cb_t, ca, max_iterations=3, resume=resume, **common
        )
        did = int(res.iterations)  # D2H sync, like the driver
        dt = time.perf_counter() - t0
        s = res.em
        total += did
        resume = CPDResume(
            rotation=s.rotation, translation=s.translation,
            scale=s.scale, sigma2=s.sigma2,
            log_likelihood=s.log_likelihood, ntol=s.ntol,
            done_before=jnp.int32(total),
        )
        print(
            f"old chunk {ci}: {dt:.3f} s for {did} iters "
            f"(sigma2={float(s.sigma2):.5f})", flush=True
        )
        if did < 3:
            break
    print(
        f"old chunked total: {time.perf_counter() - t_all:.2f} s",
        flush=True,
    )

    # --- (c) new chunked driver (hoisted sort) ---
    cb_t2 = pad_cloud((pts * (1.0 + 2e-5)).astype(np.float32))
    t0 = time.perf_counter()
    res = cpd_register_chunked(
        cb_t2, ca, max_iterations=15, chunk=3, **common
    )
    err = float(res.error)
    print(
        f"new chunked (hoisted sort): {time.perf_counter() - t0:.2f} s "
        f"for {int(res.iterations)} iters (err={err:.5f})", flush=True
    )

    # --- (d) single dispatch, 15 iterations ---
    cb_t3 = pad_cloud((pts * (1.0 + 3e-5)).astype(np.float32))
    t0 = time.perf_counter()
    res = cpd_register(cb_t3, ca, max_iterations=15, **common)
    err = float(res.error)
    print(
        f"single dispatch: {time.perf_counter() - t0:.2f} s for "
        f"{int(res.iterations)} iters (err={err:.5f})", flush=True
    )


if __name__ == "__main__":
    main()
