"""Large-cloud CPD measurement — BASELINE config 4 ("CPD full GMM
registration on mustang.obj, ~376k points; stresses the NxM
responsibility matrix").

The reference's mustang.obj is a missing blob (BASELINE.md), so the
cloud is the documented `synthetic://` substitute at the same size.
Measures, on the real chip:

* exact blocked E-step seconds/iteration at 376k x 376k (1.4e11 pairs —
  the regime the reference's CPU FGT exists for; its GPU exact path was
  never run past ~1k, ``testset.cpp:63``),
* the FGT E-step at the same size,
* a short full registration with the Hybrid ladder (reference benchmark
  mode) on a subsampled-but-large pair, reporting recovered-transform
  gt-MSE.

Writes ``bench_results/cpd_large.json``.  Run: ``python tools/cpd_large.py
[size]`` (default 376_401 to mirror mustang's vertex count).
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


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 376_401

    import jax
    import jax.numpy as jnp
    import numpy as np

    read_scalar(jnp.sum(jnp.ones((8, 128))))  # prime a fresh relay worker
    print(f"backend={jax.default_backend()} size={size}", flush=True)

    from tpuslam.algorithms.cpd import (
        cpd_estep_fgt,
        sigma_squared_init,
        uniform_constant,
    )
    from tpuslam.config.configuration import ApproximationType
    from tpuslam.core.types import pad_cloud
    from tpuslam.data.loader import load_cloud
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
    )
    from tpuslam.kernels.pallas_cpd import cpd_estep_pallas

    results = {"size": size}
    rng = np.random.Generator(np.random.PCG64(666))
    pts = load_cloud(f"synthetic://{size}").astype(np.float32)
    # the reference's published protocol normalizes every cloud to
    # spread 10 BEFORE transforming (documentation.tex:397,
    # common.cpp:81-95) — without it the translation below is ~20x the
    # cloud extent and the Hybrid ladder's FGT fast phase never fires
    # (sigma^2 collapses under the switch after one centroid-aligning
    # iteration; tools/probe_hybrid_traj.py)
    from tpuslam.data.synthesis import normalize_cloud

    pts = normalize_cloud(pts.astype(np.float64), 10.0).astype(np.float32)
    cm, cn = pad_cloud(pts), pad_cloud(pts)
    mm = (jnp.arange(cm.points.shape[0]) < cm.count).astype(jnp.float32)
    nm = (jnp.arange(cn.points.shape[0]) < cn.count).astype(jnp.float32)
    s2 = sigma_squared_init(cm.points, mm, cn.points, nm)
    const = uniform_constant(s2, 0.1, cm.count, cn.count)
    print(f"sigma2_init={float(s2):.4f}", flush=True)

    # --- exact blocked E-step, one iteration ---
    interpret = jax.default_backend() != "tpu"  # CPU smoke runs only

    def estep_exact(i):
        out = cpd_estep_pallas(
            cm.points * (1.0 + 1e-5 * i), mm, cn.points, nm,
            s2, const, jnp.asarray(False), interpret=interpret,
        )
        return out.error

    dt = timeit(estep_exact, reps=2)
    results["estep_exact_s_per_iter"] = round(dt, 3)
    gpairs = (size * size) / dt / 1e9
    results["estep_exact_gpairs_per_sec"] = round(gpairs, 1)
    print(
        f"exact E-step: {dt:.3f} s/iter ({gpairs:.1f} Gpairs/s)", flush=True
    )

    # --- FGT E-step at the same size ---
    def estep_fgt(i):
        out = cpd_estep_fgt(
            cm.points * (1.0 + 1e-5 * i), mm, cn.points, nm,
            s2, jnp.float32(0.1), cm.count, cn.count,
            fgt_k=128, fgt_p=8, ratio_of_far_field=10.0,
            sigma2_init=s2,
        )
        return out.error

    dt_f = timeit(estep_fgt, reps=2)
    results["estep_fgt_s_per_iter"] = round(dt_f, 3)
    results["fgt_speedup_vs_exact"] = round(dt / dt_f, 2)
    print(
        f"FGT E-step: {dt_f:.3f} s/iter "
        f"({dt / dt_f:.2f}x vs exact)", flush=True
    )

    # --- candidate (tile-skipping) E-step across the EM trajectory ---
    # Morton-sorted clouds (as cpd_register feeds it); skip rate grows
    # as sigma^2 tightens.  Bit-identical to the dense kernel.
    from tpuslam.kernels.pallas_cpd_cand import cpd_estep_cand
    from tpuslam.ops.spatial import morton_permutation

    pm = morton_permutation(cm.points, mm)
    pn = morton_permutation(cn.points, nm)
    cm_s, mm_s = cm.points[pm], mm[pm]
    cn_s, nm_s = cn.points[pn], nm[pn]
    for label, frac, trunc in [
        ("wide_exact", 1.0, False),          # no trunc: full admission ->
        #   dense fallback (documents the wrapper's fallback is free)
        ("hybrid_switch", 0.015, True),      # the Hybrid switch point
        ("late_trunc", 0.002, True),         # tight truncation
    ]:
        s2_r = s2 * frac

        def estep_cand(i, s2_r=s2_r, trunc=trunc):
            out = cpd_estep_cand(
                cm_s * (1.0 + 1e-5 * i), mm_s, cn_s, nm_s,
                s2_r, const, jnp.asarray(trunc), interpret=interpret,
            )
            return out.error

        dt_c = timeit(estep_cand, reps=2)
        results[f"estep_cand_{label}_s_per_iter"] = round(dt_c, 3)
        results[f"estep_cand_{label}_speedup_vs_dense"] = round(dt / dt_c, 2)
        print(
            f"cand E-step {label} (s2={float(s2_r):.4f}, trunc={trunc}): "
            f"{dt_c:.3f} s/iter ({dt / dt_c:.2f}x vs dense)", flush=True
        )

    # --- short full registration, Hybrid ladder (reference bench mode) ---
    # chunked dispatch: at 376k one E-step is seconds, and multi-minute
    # single XLA programs kill relayed workers (docs/ROADMAP.md rules)
    from tpuslam.algorithms.cpd import cpd_register_chunked as cpd_register

    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    moved = (pts @ r.T + t)[rng.permutation(size)].astype(np.float32)
    cb, ca = pad_cloud(pts), pad_cloud(moved)
    import time as _time

    common = dict(
        weight=0.1, const_scale=True, tolerance=1e-4,
        approximation_type=ApproximationType.Hybrid,
    )
    # warm up compilation: max_iterations is traced, so a 9-iteration
    # call at chunk=8 compiles BOTH programs the timed run uses (the
    # cold-start trace at k=8 and the resumed-chunk trace at k=1); with
    # the FGT fast phase at ~0.3 s/iter a chunk of 8 keeps each dispatch
    # a few seconds while paying the ~0.5 s relayed dispatch latency 2x
    # instead of 5x (tools/probe_fgt_sweep.py)
    common["chunk"] = 8
    float(cpd_register(cb, ca, max_iterations=9, **common).error)
    # perturb the timed input (f32-surviving) so a relayed backend
    # cannot serve the warmed dispatch from its dedup cache
    cb_t = pad_cloud((pts * (1.0 + 1e-5)).astype(np.float32))
    t0 = _time.perf_counter()
    res = cpd_register(cb_t, ca, max_iterations=15, **common)
    err = float(res.error)  # device->host read brackets completion
    wall = _time.perf_counter() - t0
    rot = np.asarray(res.transform.rotation)
    tr = np.asarray(res.transform.translation)
    # evaluate with the perturbed moving cloud the timed run actually saw
    pts_t = np.asarray(cb_t.points[: len(pts)])
    target = pts @ r.T + t
    gt_mse = float(np.mean(np.sum((pts_t @ rot.T + tr - target) ** 2, -1)))
    results["hybrid_15iter_wall_s"] = round(wall, 1)
    results["hybrid_15iter_gt_mse"] = round(gt_mse, 5)
    # scale-free accuracy: gt-MSE relative to the squared cloud spread
    # (the cloud is normalized to spread 10, so /100)
    results["hybrid_15iter_gt_mse_rel_spread2"] = round(gt_mse / 100.0, 9)
    results["hybrid_15iter_iterations"] = int(res.iterations)
    print(
        f"hybrid 15-iter run: {wall:.1f} s wall, gt-MSE {gt_mse:.5f}, "
        f"err {err:.5f}", flush=True
    )

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "bench_results", "cpd_large.json",
    )
    with open(os.path.abspath(out), "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
