"""Is the in-loop FGT E-step slow when sigma^2 is loop-carried?

Three dynamic-trip while loops, 3 iterations each, no lax.cond:
  1. FGT body, sigma^2 = compile-time constant (the Full ladder's case)
  2. FGT body, sigma^2 loop-carried (the Hybrid fast loop's case)
  3. FGT body, sigma^2 loop-carried, adaptive-K disabled
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

from tpuslam.algorithms.cpd import cpd_estep_fgt, sigma_squared_init
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
    print(f"backend={jax.default_backend()}", flush=True)

    def mk_loop(carried_sigma, adaptive):
        @jax.jit
        def loop(x, iters):
            def body(carry):
                i, sig, acc = carry
                sig_e = sig if carried_sigma else jnp.float32(0.05)
                stats = cpd_estep_fgt(
                    x * (1.0 + 1e-6 * i.astype(jnp.float32)), mm,
                    ca.points, nm, sig_e, jnp.float32(0.1), m, n,
                    128, 8, 10.0,
                    sigma2_init=s2 if adaptive else None,
                )
                return (i + 1, sig * 0.9, acc + stats.error)

            return jax.lax.while_loop(
                lambda c: c[0] < iters, body, (jnp.int32(0), s2, 0.0)
            )[2]

        return loop

    for label, carried, adaptive in [
        ("const-sigma adaptiveK", False, True),
        ("carried-sigma adaptiveK", True, True),
        ("carried-sigma fixedK", True, False),
    ]:
        loop = mk_loop(carried, adaptive)
        it3 = jnp.int32(3)
        float(loop(cb.points, it3))
        t0 = time.perf_counter()
        float(loop(cb.points * (1.0 + 1e-5), it3))
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.3f} s ({dt/3:.3f}/iter)", flush=True)


if __name__ == "__main__":
    main()
