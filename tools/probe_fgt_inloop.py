"""Discriminate why the 376k Hybrid wide phase costs dense-kernel time.

Arms:
  A. Full ladder, use_fgt=True, 3 iterations (no lax.cond in the body).
  B. jitted lax.cond(pred, fgt, exact) single E-step, pred=True.
  C. jitted fgt E-step alone (the cpd_large.py standalone, for scale).
  D. Hybrid, use_fgt=True, 3 iterations with fast_now debug-printed.
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
    cpd_estep_auto,
    cpd_estep_fgt,
    cpd_register,
    sigma_squared_init,
    uniform_constant,
)
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)

SIZE = 376_401


def timed(label, fn, reps=2):
    float(jnp.asarray(fn(0)).reshape(-1)[0])  # compile + settle
    t0 = time.perf_counter()
    for i in range(1, reps + 1):
        out = fn(i)
    float(jnp.asarray(out).reshape(-1)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt:.3f} s", flush=True)
    return dt


def main():
    rng = np.random.Generator(np.random.PCG64(666))
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(SIZE)].astype(np.float32)
    cb, ca = pad_cloud(pts), pad_cloud(moved)
    print(f"backend={jax.default_backend()}", flush=True)

    mm = (jnp.arange(cb.points.shape[0]) < cb.count).astype(jnp.float32)
    nm = (jnp.arange(ca.points.shape[0]) < ca.count).astype(jnp.float32)
    s2 = sigma_squared_init(cb.points, mm, ca.points, nm)
    m, n = jnp.sum(mm), jnp.sum(nm)
    const = uniform_constant(s2, 0.1, m, n)

    # C: FGT E-step alone
    @jax.jit
    def fgt_alone(x):
        return cpd_estep_fgt(
            x, mm, ca.points, nm, s2, jnp.float32(0.1), m, n,
            128, 8, 10.0, sigma2_init=s2,
        ).error

    timed("C fgt-alone", lambda i: fgt_alone(
        cb.points * (1.0 + 1e-5 * i)))

    # B: cond-wrapped E-step, pred True
    @jax.jit
    def cond_estep(x, pred):
        return jax.lax.cond(
            pred,
            lambda: cpd_estep_fgt(
                x, mm, ca.points, nm, s2, jnp.float32(0.1), m, n,
                128, 8, 10.0, sigma2_init=s2,
            ),
            lambda: cpd_estep_auto(
                x, mm, ca.points, nm, s2, const, jnp.asarray(True),
            ),
        ).error

    timed("B cond(pred=True)", lambda i: cond_estep(
        cb.points * (1.0 + 1e-5 * i), jnp.asarray(True)))
    timed("B cond(pred=False)", lambda i: cond_estep(
        cb.points * (1.0 + 1e-5 * i), jnp.asarray(False)))

    # A: Full ladder 3 iters, use_fgt forced True
    def full3(i):
        return cpd_register(
            pad_cloud((pts * (1.0 + 1e-5 * i)).astype(np.float32)), ca,
            weight=0.1, const_scale=True, tolerance=1e-4,
            max_iterations=3,
            approximation_type=ApproximationType.Full,
            use_fgt=True,
        ).error

    timed("A full-ladder 3 iters (per-call)", full3)

    # D: Hybrid 3 iters, use_fgt True
    def hyb3(i):
        return cpd_register(
            pad_cloud((pts * (1.0 + 1e-5 * i)).astype(np.float32)), ca,
            weight=0.1, const_scale=True, tolerance=1e-4,
            max_iterations=3,
            approximation_type=ApproximationType.Hybrid,
            use_fgt=True,
        ).error

    timed("D hybrid 3 iters (per-call)", hyb3)


if __name__ == "__main__":
    main()
