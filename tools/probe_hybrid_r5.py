"""Round-5 wall-residual discriminator for the 376k hybrid budget.

The measured wall (7.98 s r5) exceeds the sum of standalone stage rates
(~4.0 s + presort/H2D/dispatch ~1.1 s).  This probe separates the TRUE
in-loop per-iteration cost from fixed per-dispatch cost by the slope
method: time ``cpd_register`` (Full + FGT, single program — the
fast-phase body alone) at max_iterations = 3 and 13 on the same
compiled program; (t13 - t3) / 10 is the honest in-loop fast-iteration
cost, and t3 - 3*slope is the per-dispatch constant (H2D + relay +
in-program setup incl. the two cached clusterings).  Repeats the same
for the Hybrid 15-iteration program used by the headline.

Run: ``python tools/probe_hybrid_r5.py [size]`` (default 376_401).
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

from tpuslam.harness.measure import read_scalar, timeit  # noqa: E402


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 376_401

    import jax
    import jax.numpy as jnp
    import numpy as np

    read_scalar(jnp.sum(jnp.ones((8, 128))))
    print(f"backend={jax.default_backend()} size={size}", flush=True)

    from tpuslam.algorithms.cpd import cpd_register
    from tpuslam.config.configuration import ApproximationType
    from tpuslam.core.types import Cloud, pad_cloud
    from tpuslam.data.loader import load_cloud
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
        normalize_cloud,
    )
    from tpuslam.ops.spatial import host_morton_order

    rng = np.random.Generator(np.random.PCG64(666))
    pts = normalize_cloud(
        load_cloud(f"synthetic://{size}").astype(np.float64), 10.0
    ).astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(size)].astype(np.float32)

    def sorted_cloud(a):
        c = pad_cloud(a)
        p = np.zeros(c.points.shape, np.float32)
        p[: len(a)] = a
        return Cloud(jnp.asarray(p[host_morton_order(p, len(a))]), c.count)

    cb, ca = sorted_cloud(pts), sorted_cloud(moved)
    results = {"size": size}

    def run(mode, use_fgt, iters):
        def f(i):
            res = cpd_register(
                Cloud(cb.points * (1.0 + 1e-5 * i), cb.count), ca,
                weight=0.1, const_scale=True, tolerance=0.0,
                eps=1e-12, max_iterations=iters,
                approximation_type=mode, use_fgt=use_fgt,
                assume_sorted=True,
            )
            return res.error

        return timeit(f, reps=2)

    # pure slow phase: resume below the 0.015*sigma2_0 switch, so every
    # iteration is a slow (truncated candidate) one — the clean in-loop
    # slow rate without phase mixing
    from tpuslam.algorithms.cpd import CPDResume, hybrid_fast_threshold

    thr = hybrid_fast_threshold(cb, ca)

    def run_slow(iters):
        def f(i):
            res = cpd_register(
                Cloud(cb.points * (1.0 + 1e-5 * i), cb.count), ca,
                weight=0.1, const_scale=True, tolerance=0.0,
                eps=1e-12, max_iterations=iters,
                approximation_type=ApproximationType.Hybrid,
                use_fgt=True, assume_sorted=True,
                resume=CPDResume(
                    rotation=jnp.eye(3, dtype=jnp.float32),
                    translation=jnp.zeros(3, jnp.float32),
                    scale=jnp.float32(1.0),
                    sigma2=thr * 0.9,
                    log_likelihood=jnp.float32(1.0),
                    ntol=jnp.float32(10.0),
                ),
            )
            return res.error

        return timeit(f, reps=2)

    t3 = run_slow(3)
    t13 = run_slow(13)
    slope = (t13 - t3) / 10.0
    results["slow_only_t3_s"] = round(t3, 3)
    results["slow_only_t13_s"] = round(t13, 3)
    results["slow_only_iter_s"] = round(slope, 3)
    print(
        f"slow_only: t3={t3:.3f} t13={t13:.3f} -> "
        f"{slope:.3f} s/iter in-loop", flush=True,
    )

    for label, mode in (
        ("full_fgt", ApproximationType.Full),
        ("hybrid_fgt", ApproximationType.Hybrid),
    ):
        t3 = run(mode, True, 3)
        t13 = run(mode, True, 13)
        slope = (t13 - t3) / 10.0
        fixed = t3 - 3.0 * slope
        results[f"{label}_t3_s"] = round(t3, 3)
        results[f"{label}_t13_s"] = round(t13, 3)
        results[f"{label}_iter_s"] = round(slope, 3)
        results[f"{label}_fixed_s"] = round(fixed, 3)
        print(
            f"{label}: t3={t3:.3f} t13={t13:.3f} -> "
            f"{slope:.3f} s/iter in-loop, {fixed:.3f} s fixed/dispatch",
            flush=True,
        )

    out = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "bench_results", "hybrid_r5_probe.json",
    ))
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
