"""Per-iteration cost of the Hybrid fast-loop body on REAL data
(transformed pair, no early exit): bare FGT, +transform, +mstep, and
the full cpd_register.  Every earlier probe used identical clouds where
sigma^2 collapses and the loop exits early — optimistic per-iter math.
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
    CPDState,
    _morton_sort_cloud,
    cpd_estep_fgt,
    cpd_mstep,
    cpd_register,
    sigma_squared_init,
)
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)

SIZE = 376_401
ITERS = 6


def main():
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    rng = np.random.Generator(np.random.PCG64(666))
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(SIZE)].astype(np.float32)
    cb = _morton_sort_cloud(pad_cloud(pts))
    ca = _morton_sort_cloud(pad_cloud(moved))
    moving, target = cb.points, ca.points
    mm, nm = cb.mask(), ca.mask()
    m, n = jnp.sum(mm), jnp.sum(nm)
    s2 = sigma_squared_init(moving, mm, target, nm)
    print(f"backend={jax.default_backend()} s2_0={float(s2):.4f}",
          flush=True)
    float(jnp.sum(jnp.ones((8, 128))))

    def fgt(x, sig):
        return cpd_estep_fgt(
            x, mm, target, nm, sig, jnp.float32(0.1), m, n,
            128, 8, 10.0, sigma2_init=s2,
        )

    def timed(label, fn, arg):
        float(fn(arg * 0).sigma2 if hasattr(fn(arg * 0), "sigma2")
              else fn(arg * 0))
        t0 = time.perf_counter()
        out = fn(arg)
        val = out.sigma2 if hasattr(out, "sigma2") else out
        v = float(val)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.3f} s total, {dt/ITERS:.3f}/iter (v={v:.5f})",
              flush=True)

    it = jnp.int32(ITERS)

    # (A) bare FGT on the REAL pair, fixed trip count, sigma follows a
    # realistic decay so each iteration sees a fresh sigma
    @jax.jit
    def a(p):
        def body(carry):
            i, sig, acc = carry
            st = fgt(moving * (1.0 + p + 1e-6 * i.astype(jnp.float32)),
                     sig)
            return (i + 1, sig * 0.7, acc + st.error * 1e-9)

        out = jax.lax.while_loop(
            lambda c: c[0] < it, body, (jnp.int32(0), s2, jnp.float32(0)))
        return out[2]

    timed("(A) bare FGT, real pair", a, jnp.float32(1e-5))

    # (B) + transform from carried R,t (like the body)
    @jax.jit
    def b(p):
        def body(carry):
            i, sig, rot, tr, acc = carry
            x = (moving * (1.0 + p)) @ rot.T + tr
            st = fgt(x, sig)
            # fold the stats into the carried transform cheaply
            rot = rot + 1e-12 * st.px[0, 0]
            tr = tr + 1e-12 * st.p1[0]
            return (i + 1, sig * 0.7, rot, tr, acc + st.error * 1e-9)

        out = jax.lax.while_loop(
            lambda c: c[0] < it, body,
            (jnp.int32(0), s2, jnp.eye(3, dtype=jnp.float32),
             jnp.zeros((3,), jnp.float32), jnp.float32(0)))
        return out[4]

    timed("(B) + carried transform", b, jnp.float32(1e-5))

    # (C) + the real M-step
    @jax.jit
    def c(p):
        def body(s):
            x = s.scale * ((moving * (1.0 + p)) @ s.rotation.T) \
                + s.translation
            st = fgt(x, s.sigma2)
            ntol = jnp.abs((st.error - s.log_likelihood) / st.error)
            mres = cpd_mstep(moving * (1.0 + p), target, st, True, s.scale)
            return CPDState(
                rotation=mres.rotation, translation=mres.translation,
                scale=mres.scale, sigma2=mres.sigma2,
                log_likelihood=st.error, ntol=ntol,
                iterations=s.iterations + 1)

        init = CPDState(
            rotation=jnp.eye(3, dtype=jnp.float32),
            translation=jnp.zeros((3,), jnp.float32),
            scale=jnp.float32(1.0), sigma2=s2,
            log_likelihood=jnp.float32(0.0), ntol=jnp.float32(10.0),
            iterations=jnp.int32(0))
        return jax.lax.while_loop(
            lambda s: s.iterations < it, body, init)

    timed("(C) + real mstep (full body)", c, jnp.float32(1e-5))

    # (D) full cpd_register, 6 iterations
    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-7, eps=1e-7,
        approximation_type=ApproximationType.Hybrid, assume_sorted=True,
    )

    @jax.jit
    def d(p):
        res = cpd_register(
            cb._replace(points=moving * (1.0 + p)), ca,
            max_iterations=ITERS, **common)
        return res.error

    float(d(jnp.float32(0)))
    t0 = time.perf_counter()
    e = float(d(jnp.float32(1e-5)))
    dt = time.perf_counter() - t0
    print(f"(D) cpd_register {ITERS} iters: {dt:.3f} s total, "
          f"{dt/ITERS:.3f}/iter (err={e:.5f})", flush=True)


if __name__ == "__main__":
    main()
