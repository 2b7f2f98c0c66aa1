"""One-command TPU smoke test: every algorithm + kernels on the real chip
at moderate sizes, value-read verified.  Prints PASS/FAIL lines; exits
nonzero on any failure.  (CPU fallback works too — drop the env pin.)"""

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

import numpy as np


def main() -> int:
    import jax

    from tpuslam.algorithms.cpd import cpd_register
    from tpuslam.algorithms.icp import icp_register
    from tpuslam.algorithms.nicp import nicp_register
    from tpuslam.core.types import pad_cloud
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    failures = 0

    def check(name, fn, tol):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            mse = fn()
            ok = mse < tol
        except Exception as exc:  # noqa: BLE001 — smoke test surface
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
            failures += 1
            return
        wall = time.perf_counter() - t0
        status = "PASS" if ok else "FAIL"
        if not ok:
            failures += 1
        print(f"{status} {name}: gt-mse={mse:.2e} ({wall:.1f}s)")

    def make(n, scale=None, structured=False, trans=5.0):
        if structured:
            # surface-structured cloud: ICP on pure uniform noise stalls
            # in shallow minima (faithful to the reference's low ICP
            # convergence); real workloads register surfaces
            from tpuslam.data.loader import synthetic_cloud
            from tpuslam.data.synthesis import normalize_cloud

            pts = normalize_cloud(
                synthetic_cloud(n)[:n], 10.0
            ).astype(np.float32)
        else:
            pts = (rng.random((n, 3), dtype=np.float64) * 10.0).astype(
                np.float32
            )
        if scale is not None:
            pts = pts * np.asarray(scale, np.float32)
        r = get_random_rotation_matrix(rng, 0.2)
        t = get_random_translation_vector(rng, trans)
        after = (pts @ r.T + t)[rng.permutation(n)].astype(np.float32)
        return pts, after, r, t

    def gt_mse(before, rot, trans, r, t, s=1.0):
        return float(
            np.mean(
                np.sum(
                    (s * (before @ np.asarray(rot).T) + np.asarray(trans)
                     - (before @ r.T + t)) ** 2, -1
                )
            )
        )

    b, a, r, t = make(50_000, structured=True)
    check(
        "icp@50k",
        lambda: gt_mse(
            b,
            *(res := icp_register(pad_cloud(b), pad_cloud(a),
                                  max_iterations=60)).transform[:2],
            r, t,
        ),
        1e-2,
    )

    b, a, r, t = make(200_000, scale=[1.0, 0.6, 0.3])
    check(
        "nicp@200k",
        lambda: gt_mse(
            b,
            *nicp_register(pad_cloud(b), pad_cloud(a), seed=2).transform[:2],
            r, t,
        ),
        1e-2,
    )

    # CPD: moderate displacement (its EM basin is narrower than ICP's
    # with the benchmark weight; faithful to the reference's convergence
    # profile)
    b, a, r, t = make(8_192, trans=2.0)
    def run_cpd():
        res = cpd_register(
            pad_cloud(b), pad_cloud(a), weight=0.1,
            max_iterations=120, tolerance=1e-6,
        )
        return gt_mse(
            b, res.transform.rotation, res.transform.translation, r, t,
            float(res.transform.scale),
        )
    check("cpd@8k", run_cpd, 5e-2)

    print("backend:", jax.default_backend())
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
