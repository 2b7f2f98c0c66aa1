"""FGT in-loop cost as a function of sigma^2 along the Hybrid
trajectory at 376k.  The standalone FGT bench measures at sigma^2_init
(0.29 s/iter) but the hybrid headline runs ~1 s/iter — if the FGT gets
more expensive as sigma^2 shrinks (adaptive K, far-field admission),
the headline is E-step-bound, not overhead-bound.

Also times each chunk of the NEW (hoisted-sort) chunked driver.
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
    cpd_estep_fgt,
    cpd_register,
    sigma_squared_init,
)
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)

SIZE = 376_401


def main():
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    cb = pad_cloud(pts)
    ca = pad_cloud(pts)
    mm = (jnp.arange(cb.points.shape[0]) < cb.count).astype(jnp.float32)
    nm = mm
    s2 = sigma_squared_init(cb.points, mm, ca.points, nm)
    m = n = jnp.sum(mm)
    print(f"backend={jax.default_backend()} s2_0={float(s2):.4f}",
          flush=True)
    float(jnp.sum(jnp.ones((8, 128))))

    @jax.jit
    def loop(x, sig_val, iters):
        def body(carry):
            i, acc = carry
            stats = cpd_estep_fgt(
                x * (1.0 + 1e-6 * i.astype(jnp.float32)), mm,
                ca.points, nm, sig_val, jnp.float32(0.1), m, n,
                128, 8, 10.0, sigma2_init=s2,
            )
            return (i + 1, acc + stats.error)

        return jax.lax.while_loop(
            lambda c: c[0] < iters, body, (jnp.int32(0), 0.0)
        )[1]

    it3 = jnp.int32(3)
    for frac in (1.0, 0.3, 0.1, 0.05, 0.021, 0.016):
        sig = s2 * frac
        float(loop(cb.points, sig, it3))
        t0 = time.perf_counter()
        float(loop(cb.points * (1.0 + 1e-5), sig, it3))
        dt = time.perf_counter() - t0
        print(
            f"in-loop FGT at s2={float(sig):.5f} (s2/s2_0={frac}): "
            f"{dt/3:.3f} s/iter", flush=True
        )

    # --- per-chunk timing of the new (hoisted-sort) driver path ---
    from tpuslam.config.configuration import ApproximationType

    rng = np.random.Generator(np.random.PCG64(666))
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(SIZE)].astype(np.float32)
    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
        assume_sorted=True,
    )
    cb_s = _morton_sort_cloud(pad_cloud(pts))
    ca_s = _morton_sort_cloud(pad_cloud(moved))
    # warm both traces
    res = cpd_register(cb_s, ca_s, max_iterations=3, **common)
    sw = res.em
    resume_w = CPDResume(
        rotation=sw.rotation, translation=sw.translation, scale=sw.scale,
        sigma2=sw.sigma2, log_likelihood=sw.log_likelihood, ntol=sw.ntol,
        done_before=jnp.int32(3),
    )
    float(cpd_register(
        cb_s, ca_s, max_iterations=3, resume=resume_w, **common
    ).error)

    cb_s2 = _morton_sort_cloud(
        pad_cloud((pts * (1.0 + 1e-5)).astype(np.float32))
    )
    resume = None
    total = 0
    t_all = time.perf_counter()
    for ci in range(5):
        t0 = time.perf_counter()
        res = cpd_register(
            cb_s2, ca_s, max_iterations=3, resume=resume, **common
        )
        did = int(res.iterations)
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
            f"new chunk {ci}: {dt:.3f} s for {did} iters "
            f"(sigma2={float(s.sigma2):.5f}, "
            f"s2/s2_0={float(s.sigma2 / s2):.4f})", flush=True
        )
        if did < 3:
            break
    print(f"new chunked total: {time.perf_counter() - t_all:.2f} s",
          flush=True)


if __name__ == "__main__":
    main()
