"""Sweep the single-pass CPD E-step's target lane width (_BN_SINGLE) on
the chip.  The recorded single-pass win over the two-phase kernel was
only 1.03x at 8k (bench_report.json) — if a wider target tile (fewer,
fatter grid steps) moves that, fold the winner back into
``kernels/pallas_cpd.py``.  Run on TPU: ``python tools/sweep_estep_single.py``.
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

from bench_report import read_scalar, timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    read_scalar(jnp.sum(jnp.ones((8, 128))))  # prime a fresh worker
    print(f"backend={jax.default_backend()}")

    import tpuslam.kernels.pallas_cpd as pc
    from tpuslam.algorithms.cpd import sigma_squared_init, uniform_constant
    from tpuslam.core.types import pad_cloud

    rng = np.random.Generator(np.random.PCG64(7))
    for m_pts in (8_192, 4_096):
        mov = (rng.random((m_pts, 3)) * 10.0).astype(np.float32)
        targ = (rng.random((20_480, 3)) * 10.0).astype(np.float32)
        cm, cn = pad_cloud(mov), pad_cloud(targ)
        mm = (jnp.arange(cm.points.shape[0]) < cm.count).astype(jnp.float32)
        nm = (jnp.arange(cn.points.shape[0]) < cn.count).astype(jnp.float32)
        s2 = sigma_squared_init(cm.points, mm, cn.points, nm)
        const = uniform_constant(s2, 0.1, cm.count, cn.count)

        def run_two(i):
            return pc.cpd_estep_pallas(
                cm.points * (1.0 + 1e-5 * i), mm, cn.points, nm,
                s2, const, jnp.asarray(False),
            ).error

        base = timeit(run_two, reps=5)
        print(f"M={m_pts}: two-phase {base * 1000:.2f} ms")

        oracle = None
        for bn in (128, 256, 512):
            pc._BN_SINGLE = bn
            pc.cpd_estep_pallas_single.clear_cache()

            def run_single(i):
                return pc.cpd_estep_pallas_single(
                    cm.points * (1.0 + 1e-5 * i), mm, cn.points, nm,
                    s2, const, jnp.asarray(False),
                ).error

            try:
                # correctness first: the error scalar must match two-phase
                err_s = float(run_single(0))
                err_t = float(run_two(0))
                assert abs(err_s - err_t) <= 1e-3 * max(1.0, abs(err_t)), (
                    bn, err_s, err_t
                )
                if oracle is None:
                    oracle = err_t
                dt = timeit(run_single, reps=5)
                print(
                    f"M={m_pts}: single-pass BN={bn} {dt * 1000:.2f} ms "
                    f"({base / dt:.2f}x vs two-phase)"
                )
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                print(f"M={m_pts}: single-pass BN={bn} FAILED: {e}")
        pc._BN_SINGLE = 128
        pc.cpd_estep_pallas_single.clear_cache()


if __name__ == "__main__":
    main()
