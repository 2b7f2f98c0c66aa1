"""Stage split of one device-FGT CPD E-step at mustang scale (round 5,
VERDICT task 2): where do the 0.294 s/iter go?

Stages timed separately (each as its own jitted call, warmed, perturbed
inputs, read-bracketed — the sum is an upper bound on the fused in-loop
cost since XLA can overlap/fuse some boundaries):

  * ``k_center``: farthest-point clustering (127 sequential fori_loop
    steps, each an O(N) distance + argmax) — run TWICE per E-step
    (moving-side model + target-side model);
  * ``model``: monomial expansion + segment_sum (A_k), per side;
  * ``predict_kt1``: target <- moving-side model (W=1);
  * ``predict_out``: moving <- target-side model (W=4);
  * ``estep_fgt``: the full fused E-step for reference.

Run: ``python tools/probe_fgt_stages.py [size]`` (default 376_401).
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

    from tpuslam.algorithms.cpd import cpd_estep_fgt, sigma_squared_init
    from tpuslam.core.types import pad_cloud
    from tpuslam.data.loader import load_cloud
    from tpuslam.data.synthesis import normalize_cloud
    from tpuslam.ops.fgt import (
        FGTModel,
        compute_fgt_model_multi,
        fgt_predict,
        fgt_predict_multi,
        k_center,
    )

    k, p = 128, 8
    pts = normalize_cloud(
        load_cloud(f"synthetic://{size}").astype(np.float64), 10.0
    ).astype(np.float32)
    cm = pad_cloud(pts)
    mm = (jnp.arange(cm.points.shape[0]) < cm.count).astype(jnp.float32)
    s2 = sigma_squared_init(cm.points, mm, cm.points, mm)
    hsigma = jnp.sqrt(2.0 * s2)
    results = {"size": size, "k": k, "p": p}

    kc = jax.jit(lambda x: k_center(x, mm, k)[1])
    dt = timeit(lambda i: kc(cm.points * (1.0 + 1e-5 * i)), reps=3)
    results["k_center_s"] = round(dt, 4)
    print(f"k_center: {dt:.4f} s", flush=True)

    w4 = jnp.concatenate(
        [mm[:, None], cm.points * mm[:, None]], axis=1
    )
    model_fn = jax.jit(
        lambda x: compute_fgt_model_multi(x, w4, mm, hsigma, k, p).ak
    )
    dt = timeit(lambda i: model_fn(cm.points * (1.0 + 1e-5 * i)), reps=3)
    results["model_w4_s"] = round(dt, 4)  # includes its own k_center
    print(f"model (W=4, incl. clustering): {dt:.4f} s", flush=True)

    model = compute_fgt_model_multi(cm.points, w4, mm, hsigma, k, p)
    m1 = FGTModel(centers=model.centers, ak=model.ak[..., :1])

    pred1 = jax.jit(
        lambda x: fgt_predict(
            x, FGTModel(centers=m1.centers, ak=m1.ak[..., 0]),
            hsigma, 10.0, p,
        )
    )
    dt = timeit(lambda i: pred1(cm.points * (1.0 + 1e-5 * i)), reps=3)
    results["predict_w1_s"] = round(dt, 4)
    print(f"predict (W=1): {dt:.4f} s", flush=True)

    pred4 = jax.jit(
        lambda x: fgt_predict_multi(x, model, hsigma, 10.0, p)
    )
    dt = timeit(lambda i: pred4(cm.points * (1.0 + 1e-5 * i)), reps=3)
    results["predict_w4_s"] = round(dt, 4)
    print(f"predict (W=4): {dt:.4f} s", flush=True)

    def full(i):
        out = cpd_estep_fgt(
            cm.points * (1.0 + 1e-5 * i), mm, cm.points, mm,
            s2, jnp.float32(0.1), cm.count, cm.count,
            fgt_k=k, fgt_p=p, ratio_of_far_field=10.0, sigma2_init=s2,
        )
        return out.error

    dt = timeit(full, reps=3)
    results["estep_fgt_s"] = round(dt, 4)
    print(f"full estep_fgt: {dt:.4f} s", flush=True)

    out = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "bench_results", "fgt_stages.json",
    ))
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
