"""Per-iteration diagnosis of the 376k Hybrid CPD registration wall
(VERDICT r3 #1: target <= 8 s for the 15-iteration run).

Runs the same registration as tools/cpd_large.py but chunk=1, timing
every dispatch and printing sigma^2 so each iteration can be classed
wide (FGT phase, sigma^2 > 0.015 sigma0^2) or late (truncated exact).
Also times one lax.cond-wrapped E-step in both phases standalone, to
separate kernel time from dispatch/driver overhead.
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

from tpuslam.algorithms.cpd import cpd_register
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)

SIZE = 376_401


def main():
    rng = np.random.Generator(np.random.PCG64(666))
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(SIZE)].astype(np.float32)
    cb, ca = pad_cloud(pts), pad_cloud(moved)
    print(f"backend={jax.default_backend()}", flush=True)

    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
    )

    from tpuslam.algorithms.cpd import CPDResume

    # warm both programs (cold + resumed), 1 iteration each
    res = cpd_register(cb, ca, max_iterations=1, **common)
    float(res.error)
    resume = CPDResume(
        rotation=res.em.rotation, translation=res.em.translation,
        scale=res.em.scale, sigma2=res.em.sigma2,
        log_likelihood=res.em.log_likelihood, ntol=res.em.ntol,
        done_before=1,
    )
    res2 = cpd_register(cb, ca, max_iterations=1, resume=resume, **common)
    float(res2.error)
    print("warmed", flush=True)

    # timed: 15 iterations, one dispatch each
    cb_t = pad_cloud((pts * (1.0 + 1e-5)).astype(np.float32))
    resume = None
    total = 0.0
    for i in range(15):
        t0 = time.perf_counter()
        res = cpd_register(
            cb_t, ca, max_iterations=1, resume=resume, **common
        )
        s2 = float(res.error)
        dt = time.perf_counter() - t0
        total += dt
        em = res.em
        resume = CPDResume(
            rotation=em.rotation, translation=em.translation,
            scale=em.scale, sigma2=em.sigma2,
            log_likelihood=em.log_likelihood, ntol=em.ntol,
            done_before=i + 1,
        )
        print(
            f"iter {i:2d}: {dt*1e3:8.1f} ms  sigma2={s2:.6f} "
            f"ntol={float(em.ntol):.2e} its={int(res.iterations)}",
            flush=True,
        )
        if int(res.iterations) == 0:
            print("converged/stopped", flush=True)
            break
    print(f"total (chunk=1, incl per-dispatch overhead): {total:.1f} s",
          flush=True)


if __name__ == "__main__":
    main()
