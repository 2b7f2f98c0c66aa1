"""Is parity the ceiling for batched 16x16k ICP? (VERDICT r3 weak #3)

The unrolled batch lowering IS 16 solo bodies in one jitted program, so
the only ways a fused program could beat 16 sequential solo dispatches
are (a) removing per-dispatch overhead, or (b) overlapping work across
pairs.  (b) is impossible on a TPU core — kernels execute one at a time
on the single TensorCore, and the NN kernels dominate wall time.  This
probe measures (a) directly:

  T1   = one solo 16k pair, 20 fixed iterations (mean of reps)
  T16  = 16 solo pairs run back-to-back (the bench_report baseline)
  TB   = the fused unrolled batch program

JAX dispatch is asynchronous: the solo loop enqueues all 16 programs and
drains once, so if T16 ~= 16*T1 the dispatch overhead a fused program
could amortize is ~zero and parity IS the throughput ceiling — the
measured 0.96-0.98x is that ceiling minus program-scheduling noise
(quantified here by the rep spread).  Writes bench_results/
batch_parity.json.
"""

import json
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

from tpuslam.core.types import Cloud, pad_cloud

N_PAIRS, PAIR_N, ITERS, REPS = 16, 16_384, 20, 5


def make_pair(rng, n):
    b = (rng.random((n, 3), dtype=np.float64) * 10.0).astype(np.float32)
    from tpuslam.data.synthesis import (
        get_random_rotation_matrix,
        get_random_translation_vector,
    )

    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    a = (b @ r.T + t)[rng.permutation(n)].astype(np.float32)
    return pad_cloud(b), pad_cloud(a)


def time_reps(fn):
    """Per-rep wall times (distinct perturbed inputs, drain each rep)."""
    float(fn(0))
    out = []
    for i in range(1, REPS + 1):
        t0 = time.perf_counter()
        float(fn(i))
        out.append(time.perf_counter() - t0)
    return out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    float(jnp.sum(jnp.ones((8, 128))))

    from tpuslam.algorithms.batch import icp_register_batch, stack_clouds
    from tpuslam.algorithms.icp import icp_register

    rng = np.random.Generator(np.random.PCG64(20260820))
    pairs = [make_pair(rng, PAIR_N) for _ in range(N_PAIRS)]
    bb = stack_clouds([np.asarray(b.points) for b, _ in pairs])
    ba = stack_clouds([np.asarray(a.points) for _, a in pairs])

    kw = dict(
        eps=0.0, max_distance_squared=1e18, max_iterations=ITERS,
        divergence_guard=False,
    )

    def solo_one(i):
        b, a = pairs[0]
        return icp_register(
            Cloud(b.points * (1.0 + 1e-5 * i), b.count), a, **kw
        ).error

    def solo_all(i):
        e = None
        for b, a in pairs:
            e = icp_register(
                Cloud(b.points * (1.0 + 1e-5 * i), b.count), a, **kw
            ).error
        return e

    def batch_all(i):
        return icp_register_batch(
            Cloud(bb.points * (1.0 + 1e-5 * i), bb.count), ba, **kw
        ).error[-1]

    t1 = time_reps(solo_one)
    t16 = time_reps(solo_all)
    tb = time_reps(batch_all)

    res = {
        "pairs": N_PAIRS, "pair_n": PAIR_N, "iters": ITERS, "reps": REPS,
        "solo_one_s": [round(x, 4) for x in t1],
        "solo_16_s": [round(x, 4) for x in t16],
        "batch_s": [round(x, 4) for x in tb],
        "solo_one_mean_s": round(float(np.mean(t1)), 4),
        "solo_16_mean_s": round(float(np.mean(t16)), 4),
        "batch_mean_s": round(float(np.mean(tb)), 4),
        # seconds of per-dispatch overhead the fused program could remove
        "dispatch_overhead_s": round(
            float(np.mean(t16) - N_PAIRS * np.mean(t1)), 4
        ),
        "dispatch_overhead_frac": round(
            float(np.mean(t16) / (N_PAIRS * np.mean(t1)) - 1.0), 4
        ),
        "batch_vs_solo": round(float(np.mean(t16) / np.mean(tb)), 3),
        "rep_spread_frac": round(
            float(
                max(
                    (max(a) - min(a)) / np.mean(a) for a in (t16, tb)
                )
            ),
            4,
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results", "batch_parity.json",
    )
    with open(out, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    main()
