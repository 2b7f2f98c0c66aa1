"""Amortized CPD E-step kernel timing (VERDICT r2 #5).

The round-2 numbers (cpd_estep_20k_ms=10.7, cpd_estep_8k_*~10.2,
singlepass_speedup=1.03) are suspicious: an 8k E-step does 6x less work
than a 20k one yet measured the same — consistent with ~8-10 ms of
fixed per-dispatch latency through the TPU relay swamping both.  This
tool times a ``lax.scan`` chain of K E-steps inside ONE jitted program
(the carry perturbs the moving cloud so no step can be elided), giving
the kernels' honest amortized cost, then prints the implied fixed
overhead from the one-shot numbers.

Usage: python tools/estep_chain.py [K]
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

import jax
import jax.numpy as jnp
import numpy as np


def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])


def timeit(fn, reps=3):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from tpuslam.algorithms.cpd import sigma_squared_init, uniform_constant
    from tpuslam.core.types import pad_cloud
    from tpuslam.kernels.pallas_cpd import (
        cpd_estep_pallas,
        cpd_estep_pallas_single,
    )

    rng = np.random.Generator(np.random.PCG64(666))

    def setup(n):
        pts = (rng.random((n, 3), dtype=np.float64) * 10).astype(np.float32)
        tgt = (rng.random((n, 3), dtype=np.float64) * 10).astype(np.float32)
        mb, ma = pad_cloud(pts), pad_cloud(tgt)
        s2 = sigma_squared_init(mb.points, mb.mask(), ma.points, ma.mask())
        c = uniform_constant(
            s2, jnp.float32(0.1), jnp.float32(n), jnp.float32(n)
        )
        return mb, ma, s2, c

    for n, kernels in (
        (8_192, (("twophase", cpd_estep_pallas),
                 ("singlepass", cpd_estep_pallas_single))),
        (20_480, (("twophase", cpd_estep_pallas),)),
    ):
        mb, ma, s2, c = setup(n)
        for label, kern in kernels:
            @jax.jit
            def chain(ty0, kern=kern, mb=mb, ma=ma, s2=s2, c=c):
                def step(ty, _):
                    out = kern(
                        ty, mb.mask(), ma.points, ma.mask(), s2, c,
                        jnp.asarray(False),
                    )
                    # feed the sufficient stats back so nothing is dead
                    ty = ty * (1.0 + 1e-7) + out.px * 1e-12
                    return ty, out.error

                _, errs = jax.lax.scan(step, ty0, None, length=k)
                return errs[-1]

            dt = timeit(
                lambda i: chain(mb.points * (1.0 + 1e-5 * i)), reps=3
            )
            per = dt / k
            print(
                f"{n:6d} {label:10s}: {per*1e3:7.3f} ms/estep amortized "
                f"({n*n/per/1e9:6.1f} Gpairs/s)",
                flush=True,
            )

            @jax.jit
            def one(ty, kern=kern, mb=mb, ma=ma, s2=s2, c=c):
                return kern(
                    ty, mb.mask(), ma.points, ma.mask(), s2, c,
                    jnp.asarray(False),
                ).error

            dt1 = timeit(lambda i: one(mb.points * (1.0 + 1e-5 * i)),
                         reps=5)
            print(
                f"       {label:10s}: {dt1*1e3:7.3f} ms one-shot -> "
                f"~{(dt1-per)*1e3:.1f} ms fixed dispatch overhead",
                flush=True,
            )


if __name__ == "__main__":
    main()
