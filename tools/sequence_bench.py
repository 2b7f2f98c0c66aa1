"""Chip benchmark for ``register_sequence`` (VERDICT r4 #1): a 20-scan
stream at 100k points/scan.

Round 5 measures the dispatch-amortized SCAN lowering (all pairs in one
compiled program, constant-velocity seed carried in-program) against the
round-4 per-pair lowering whose wall was ~97% dispatch latency
(9.7x iteration savings bought 1.07x wall).  Rows recorded on the chip:

  * ``scan_seeded`` / ``scan_unseeded``: the new lowering;
  * ``perpair_seeded``: the round-4 path, same numerics, for the
    amortization ratio;
  * ``--patience-sweep``: seeded scan at patience 2/4/8 — the
    accuracy/wall trade under the round-4 exact-f32 transforms
    (SEED_PATIENCE was tuned under round-3 numerics).

Scan stream: the structured synthetic cloud (de-aliased tiled bunny —
a uniform random box has no geometric features and cannot be registered
at all) normalized to spread 10, moving with a smoothly varying velocity
(rotation ~0.05 rad/step, translation ~0.5/step = 5% of spread, both
slowly precessing), each scan independently RESAMPLED from a 150k
parent (~67% overlap realism) and shuffled.  Writes
``bench_results/sequence_100k.json``.  ``--cpu-smoke`` runs a tiny
stream on CPU to validate the generator/drift math without the chip.

Relay discipline: the timed call uses DIFFERENT scan arrays than the
warmup call (perturbations surviving f32) so the dispatch relay cannot
serve the timed execution from its whole-program cache, and the result
read at the end brackets real completion.
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

import numpy as np


def rot_axis_angle(axis, angle):
    axis = axis / np.linalg.norm(axis)
    k = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return (
        np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    ).astype(np.float32)


def make_stream(n_scans, n_points, parent_n, seed=666):
    from tpuslam.data.loader import synthetic_cloud
    from tpuslam.data.synthesis import normalize_cloud

    rng = np.random.Generator(np.random.PCG64(seed))
    parent = normalize_cloud(
        synthetic_cloud(parent_n).astype(np.float64), 10.0
    ).astype(np.float32)[:parent_n]

    # ground-truth absolute poses: smoothly precessing constant-ish
    # velocity (the regime the seed targets)
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    axis = np.array([0.3, 1.0, 0.2])
    vel = np.array([0.45, 0.2, -0.1], np.float32)
    for k in range(1, n_scans):
        d_axis = axis + 0.1 * np.sin(0.4 * k) * np.array([1.0, 0, 0.5])
        dr = rot_axis_angle(d_axis, 0.05 + 0.01 * np.sin(0.7 * k))
        dt = vel + 0.05 * np.array(
            [np.sin(0.3 * k), np.cos(0.5 * k), np.sin(0.2 * k)],
            np.float32,
        )
        r_prev, t_prev = poses[-1]
        poses.append((dr @ r_prev, dr @ t_prev + dt))

    scans = []
    for k, (r, t) in enumerate(poses):
        sel = rng.permutation(len(parent))[:n_points]
        scans.append((parent[sel] @ r.T + t).astype(np.float32))
    return parent, poses, scans


def drift_rms(parent, poses, out, n_scans):
    """Trajectory drift: composed absolute pose k maps scan k -> scan
    0's frame; the ground-truth inverse does the same."""
    probe = parent[:: max(1, len(parent) // 4096)][:4096]
    drifts = []
    for k in range(1, n_scans):
        r_gt, t_gt = poses[k]
        pts_k = probe @ r_gt.T + t_gt  # scan-k view of probe
        a = out.absolute[k]
        back = pts_k @ np.asarray(a.rotation).T + np.asarray(a.translation)
        drifts.append(
            float(np.sqrt(np.mean(np.sum((back - probe) ** 2, -1))))
        )
    return drifts


def main():
    cpu_smoke = "--cpu-smoke" in sys.argv
    sweep = "--patience-sweep" in sys.argv
    import jax

    if cpu_smoke:
        jax.config.update("jax_platforms", "cpu")

    from tpuslam.algorithms.sequence import register_sequence

    if not cpu_smoke:
        from tpuslam.core.device import prime_device

        prime_device()
    print(f"backend={jax.default_backend()}", flush=True)

    n_scans = 6 if cpu_smoke else 20
    n_points = 1_920 if cpu_smoke else 102_400
    parent_n = 3_000 if cpu_smoke else 153_600
    parent, poses, scans = make_stream(n_scans, n_points, parent_n)
    # warmup arrays: perturbed enough to survive f32, so the timed call
    # is a distinct whole-program execution through the relay
    warm_scans = [(s * np.float32(1.0 + 1e-5)) for s in scans]

    results = {"n_scans": n_scans, "n_points": n_points}

    def run_case(label, warm=True, **kw):
        if warm:
            register_sequence(warm_scans, max_iterations=50, eps=1e-4,
                              **kw)
        t0 = time.perf_counter()
        out = register_sequence(scans, max_iterations=50, eps=1e-4, **kw)
        wall = time.perf_counter() - t0
        iters = np.asarray(out.iterations)
        drifts = drift_rms(parent, poses, out, n_scans)
        results[f"{label}_wall_s"] = round(wall, 2)
        results[f"{label}_scans_per_sec"] = round((n_scans - 1) / wall, 2)
        results[f"{label}_mean_iters"] = round(float(iters.mean()), 1)
        results[f"{label}_final_drift_rms"] = round(drifts[-1], 4)
        print(
            f"{label}: {wall:.2f} s ({(n_scans-1)/wall:.2f} scans/s), "
            f"mean iters {iters.mean():.1f}, "
            f"final drift RMS {drifts[-1]:.4f}",
            flush=True,
        )
        return out

    run_case("scan_seeded", seed_with_previous=True)
    run_case("scan_unseeded", seed_with_previous=False)
    if not cpu_smoke:
        run_case("perpair_seeded", scan=False, seed_with_previous=True)
    if sweep:
        for p in (2, 4, 8, 12):
            run_case(f"scan_patience{p}", seed_with_previous=True,
                     patience=p)

    if "perpair_seeded_wall_s" in results:
        results["dispatch_amortization_speedup"] = round(
            results["perpair_seeded_wall_s"]
            / results["scan_seeded_wall_s"], 2
        )
    results["seed_iteration_savings"] = round(
        results["scan_unseeded_mean_iters"]
        - results["scan_seeded_mean_iters"], 1
    )
    if not cpu_smoke:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "bench_results", "sequence_100k.json",
        )
        with open(os.path.abspath(out_path), "w") as fh:
            json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
