"""Where do the 376k hybrid headline's seconds go?  Times each chunk
dispatch of the chunked driver separately, then the same 15 iterations
as ONE jitted dispatch.  (cpd_large.json shows 15.1 s wall while the
E-steps sum to ~4.3 s; tools/probe_split_struct.py V4 measured the
jitted 3-iter register at 0.28 s/iter.)
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
    _cpd_register_jit,
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

    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
    )

    # warm both chunk traces exactly like cpd_large.py
    float(
        cpd_register_chunked(cb, ca, max_iterations=4, chunk=3, **common)
        .error
    )

    cb_t = pad_cloud((pts * (1.0 + 1e-5)).astype(np.float32))

    # --- per-chunk timing (manual replica of the chunked loop) ---
    resume = None
    total = 0
    t_all = time.perf_counter()
    for ci in range(5):
        t0 = time.perf_counter()
        res = _cpd_register_jit(
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
            f"chunk {ci}: {dt:.3f} s for {did} iters "
            f"(sigma2={float(s.sigma2):.5f})", flush=True
        )
        if did < 3:
            break
    print(f"chunked total: {time.perf_counter() - t_all:.2f} s", flush=True)

    # --- single dispatch, 15 iterations ---
    cb_t2 = pad_cloud((pts * (1.0 + 2e-5)).astype(np.float32))
    # warm the 15-iter trace (same trace as any k: max_iterations traced)
    t0 = time.perf_counter()
    res = _cpd_register_jit(cb_t2, ca, max_iterations=15, **common)
    err = float(res.error)
    dt = time.perf_counter() - t0
    print(
        f"single dispatch: {dt:.2f} s for {int(res.iterations)} iters "
        f"(err={err:.5f})", flush=True
    )


if __name__ == "__main__":
    main()
