"""Per-iteration sigma^2 trajectory of the 376k hybrid headline run:
which phase (FGT fast vs truncated slow) and which kernel regime
(candidate skipping vs dense fallback) each iteration actually hits.
"""

import os
import sys

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

from tpuslam.algorithms.cpd import cpd_register, sigma_squared_init
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
    print(f"cloud extent: {pts.max(0) - pts.min(0)}", flush=True)
    float(jnp.sum(jnp.ones((8, 128))))

    mm = cb.mask()
    nm = ca.mask()
    s2_pair = sigma_squared_init(cb.points, mm, ca.points, nm)
    print(f"sigma2_0 (registration pair) = {float(s2_pair):.4f}",
          flush=True)
    print(f"hybrid switch = {0.015 * float(s2_pair):.5f}", flush=True)

    res = cpd_register(
        cb, ca, weight=0.1, const_scale=True, tolerance=1e-4,
        max_iterations=15,
        approximation_type=ApproximationType.Hybrid,
        record_history=True, history_length=16,
    )
    hist = np.asarray(res.history)  # [L, 4]: sigma2, ntol, ll, scale
    print(f"iterations={int(res.iterations)} err={float(res.error):.6f}",
          flush=True)
    sw = 0.015 * float(s2_pair)
    for i, row in enumerate(hist):
        if np.isnan(row[0]):
            break
        s2 = float(row[0])
        phase = "FAST(fgt)" if s2 > sw else "slow(trunc)"
        # truncation radius vs extent: does skipping have anything to do?
        d_cut = float(np.sqrt(-np.log(1e-3) * 2.0 * s2))
        print(
            f"iter {i+1:2d}: sigma2={s2:.6f} {phase:12s} "
            f"d_cut={d_cut:.3f} ntol={row[1]:.2e}", flush=True
        )


if __name__ == "__main__":
    main()
