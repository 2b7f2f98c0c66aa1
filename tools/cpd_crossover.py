"""Measure the exact-vs-FGT E-step crossover for the CPD fast phase.

The reference's Full/Hybrid fast phase IS the FGT
(``coherentpointdrift.cpp:141-166``, ``cpdutils.cpp:19-73``).  On TPU the
exact blocked kernel wins at small sizes (MXU tiles, no irregular
gather), but its cost is O(N*M) while FGT is ~O((N+M)*K*P): at 376k the
builder's own chip data has FGT 3.85x faster (bench_results/
cpd_large.json).  This tool measures both arms per iteration in the
WIDE-sigma^2 regime (the fast phase: sigma^2 = sigma0^2, truncation off,
FGT with the reference's adaptive K) across a size ladder and reports
the crossover size that ``tpuslam.algorithms.cpd.CPD_FGT_CROSSOVER``
must encode.

Writes ``bench_results/cpd_crossover.json``.
Run: ``python tools/cpd_crossover.py [size ...]``.
"""

from __future__ import annotations

import json
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

DEFAULT_SIZES = [50_000, 100_000, 150_000, 200_000, 376_401]


def main() -> None:
    sizes = (
        [int(a) for a in sys.argv[1:]] if len(sys.argv) > 1 else DEFAULT_SIZES
    )

    import jax
    import jax.numpy as jnp

    read_scalar(jnp.sum(jnp.ones((8, 128))))
    print(f"backend={jax.default_backend()} sizes={sizes}", flush=True)

    from tpuslam.algorithms.cpd import (
        cpd_estep_fgt,
        sigma_squared_init,
        uniform_constant,
    )
    from tpuslam.core.types import pad_cloud
    from tpuslam.data.loader import load_cloud
    from tpuslam.kernels.pallas_cpd_cand import cpd_estep_cand
    from tpuslam.ops.spatial import morton_permutation

    interpret = jax.default_backend() != "tpu"
    rows = []
    for size in sizes:
        pts = load_cloud(f"synthetic://{size}")
        cm = pad_cloud(pts)
        mm = (jnp.arange(cm.points.shape[0]) < cm.count).astype(jnp.float32)
        perm = morton_permutation(cm.points, mm)
        mv, mvm = cm.points[perm], mm[perm]
        s2 = sigma_squared_init(mv, mvm, mv, mvm)
        # fast-phase semantics: constant recomputed from current sigma^2
        const = uniform_constant(s2, 0.1, cm.count, cm.count)

        def estep_exact(i, mv=mv, mvm=mvm, s2=s2, const=const):
            out = cpd_estep_cand(
                mv * (1.0 + 1e-5 * i), mvm, mv, mvm,
                s2, const, jnp.asarray(False), interpret=interpret,
            )
            return out.error

        # the crossover gates the IN-LOOP production fast phase, where
        # the EM loop's cross-iteration clustering cache applies (both
        # farthest-point selections hoisted, cpd_register round 5) —
        # so the FGT arm is timed WITH the cache; the uncached
        # (standalone single-call) column is kept for the record
        from tpuslam.ops.fgt import k_center

        cy, iy = k_center(mv, mvm, 128)

        def estep_fgt(i, mv=mv, mvm=mvm, s2=s2, cm=cm):
            out = cpd_estep_fgt(
                mv * (1.0 + 1e-5 * i), mvm, mv, mvm,
                s2, jnp.float32(0.1), cm.count, cm.count,
                fgt_k=128, fgt_p=8, ratio_of_far_field=10.0,
                sigma2_init=s2,
            )
            return out.error

        def estep_fgt_cached(i, mv=mv, mvm=mvm, s2=s2, cm=cm,
                             cy=cy, iy=iy):
            out = cpd_estep_fgt(
                mv * (1.0 + 1e-5 * i), mvm, mv, mvm,
                s2, jnp.float32(0.1), cm.count, cm.count,
                fgt_k=128, fgt_p=8, ratio_of_far_field=10.0,
                sigma2_init=s2, clusters=(cy, iy, cy, iy),
            )
            return out.error

        reps = 3 if size <= 200_000 else 2
        dt_e = timeit(estep_exact, reps=reps)
        dt_f = timeit(estep_fgt_cached, reps=reps)
        dt_fu = timeit(estep_fgt, reps=reps)
        row = {
            "size": size,
            "exact_s_per_iter": round(dt_e, 4),
            "fgt_s_per_iter": round(dt_f, 4),
            "fgt_uncached_s_per_iter": round(dt_fu, 4),
            "fgt_speedup": round(dt_e / dt_f, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "bench_results", "cpd_crossover.json",
    ))
    # merge with prior rows (re-running a subset refreshes those sizes)
    if os.path.exists(out):
        with open(out) as fh:
            old = {r["size"]: r for r in json.load(fh).get("rows", [])}
        old.update({r["size"]: r for r in rows})
        rows = [old[s] for s in sorted(old)]

    # crossover = midpoint between the largest size where exact wins and
    # the smallest where FGT wins (monotone: exact is quadratic, FGT
    # ~linear in size)
    exact_wins = [r["size"] for r in rows if r["fgt_speedup"] < 1.0]
    fgt_wins = [r["size"] for r in rows if r["fgt_speedup"] >= 1.0]
    lo = max(exact_wins) if exact_wins else 0
    hi = min(fgt_wins) if fgt_wins else None
    crossover = (lo + hi) // 2 if hi is not None else None
    results = {"rows": rows, "crossover_size": crossover}
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
