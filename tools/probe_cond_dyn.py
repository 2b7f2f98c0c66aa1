"""Part 2: does a DYNAMIC-trip-count while_loop change the cond cost?

Also compiles the real cpd_register (Hybrid, use_fgt=True) and counts
conditional ops + fusion roots in its optimized HLO.
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

SIZE = 376_401


def main():
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    cb = pad_cloud(pts)
    ca = pad_cloud(pts)
    mm = (jnp.arange(cb.points.shape[0]) < cb.count).astype(jnp.float32)
    nm = mm
    s2 = sigma_squared_init(cb.points, mm, ca.points, nm)
    m = n = jnp.sum(mm)
    const = uniform_constant(s2, 0.1, m, n)
    print(f"backend={jax.default_backend()}", flush=True)

    def fgt(x, sig):
        return cpd_estep_fgt(
            x, mm, ca.points, nm, sig, jnp.float32(0.1), m, n,
            128, 8, 10.0, sigma2_init=s2,
        )

    def exact(x, sig):
        return cpd_estep_auto(
            x, mm, ca.points, nm, sig, const, jnp.asarray(True),
        )

    @jax.jit
    def loop_dyn(x, iters):
        def body(carry):
            i, sig, acc = carry
            stats = jax.lax.cond(
                sig > 0.015 * s2,
                lambda: fgt(x * (1.0 + 1e-6 * i.astype(jnp.float32)), sig),
                lambda: exact(x * (1.0 + 1e-6 * i.astype(jnp.float32)), sig),
            )
            return (i + 1, sig * 0.9, acc + stats.error)

        def cond(carry):
            return carry[0] < iters

        return jax.lax.while_loop(cond, body, (jnp.int32(0), s2, 0.0))[2]

    it3 = jnp.int32(3)
    float(loop_dyn(cb.points, it3))
    t0 = time.perf_counter()
    float(loop_dyn(cb.points * (1.0 + 1e-5), it3))
    dt = time.perf_counter() - t0
    print(f"dynamic-trip 3-iter while(cond): {dt:.3f} s ({dt/3:.3f}/iter)",
          flush=True)
    txt = jax.jit(loop_dyn).lower(cb.points, it3).compile().as_text()
    print(f"dyn loop HLO: ' conditional(' x{txt.count(' conditional(')}",
          flush=True)

    # the real program
    low = cpd_register.lower(
        cb, ca, weight=0.1, const_scale=True, tolerance=1e-4,
        max_iterations=3,
        approximation_type=ApproximationType.Hybrid, use_fgt=True,
    )
    txt2 = low.compile().as_text()
    print(
        f"cpd_register HLO: ' conditional(' x{txt2.count(' conditional(')} "
        f"len={len(txt2)}", flush=True)


if __name__ == "__main__":
    main()
