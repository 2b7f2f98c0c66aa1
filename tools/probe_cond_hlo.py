"""Is the Hybrid body's lax.cond flattened (both branches executed)?

1. Compile a minimal while_loop-of-cond at 376k and grep the optimized
   HLO for `conditional` ops.
2. Time the minimal loop with pred always-true: if per-iter cost ~=
   FGT-alone, the cond is real; if ~= FGT+cand, it is flattened.
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
    sigma_squared_init,
    uniform_constant,
)
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
    def loop(x):
        def body(carry):
            i, sig, acc = carry
            stats = jax.lax.cond(
                sig > 0.015 * s2,
                lambda: fgt(x * (1.0 + 1e-6 * i.astype(jnp.float32)), sig),
                lambda: exact(x * (1.0 + 1e-6 * i.astype(jnp.float32)), sig),
            )
            return (i + 1, sig * 0.9, acc + stats.error)

        def cond(carry):
            return carry[0] < 3

        out = jax.lax.while_loop(cond, body, (jnp.int32(0), s2, 0.0))
        return out[2]

    lowered = loop.lower(cb.points)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_cond = txt.count(" conditional(")
    n_cond2 = txt.count("conditional")
    print(f"optimized HLO: ' conditional(' x{n_cond}, "
          f"'conditional' substr x{n_cond2}", flush=True)

    float(loop(cb.points))
    t0 = time.perf_counter()
    v = loop(cb.points * (1.0 + 1e-5))
    float(v)
    dt = time.perf_counter() - t0
    print(f"3-iter while(cond) wall: {dt:.3f} s ({dt/3:.3f}/iter)",
          flush=True)


if __name__ == "__main__":
    main()
