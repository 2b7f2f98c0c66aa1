"""Reproduce the seeded-sequence accuracy gap (sequence_100k.json:
seeded drift RMS 3.1 vs unseeded 0.50 on TPU, equal on CPU): per-pair
transform deviation from ground truth, seeded vs unseeded, small scans
so the chip run is fast.  Usage: python tools/probe_seq_seed.py [n_pts]
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


def main():
    import jax

    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 8_192
    from tpuslam.algorithms.sequence import register_sequence
    from tpuslam.data.loader import synthetic_cloud
    from tpuslam.data.synthesis import normalize_cloud

    print(f"backend={jax.default_backend()} n={n_points}", flush=True)

    n_scans = 8
    parent_n = n_points * 3 // 2
    rng = np.random.Generator(np.random.PCG64(666))
    parent = normalize_cloud(
        synthetic_cloud(parent_n).astype(np.float64), 10.0
    ).astype(np.float32)[:parent_n]

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

    use_spatial = None if "--dense" not in sys.argv else False
    for label, seeded in (("unseeded", False), ("seeded", True)):
        out = register_sequence(
            scans, max_iterations=50, eps=1e-4, seed_with_previous=seeded,
            use_spatial=use_spatial,
        )
        print(f"--- {label}")
        for k in range(n_scans - 1):
            # gt relative transform scan k -> k+1:
            # x_{k+1} = R_{k+1} R_k^T x_k + (t_{k+1} - R_{k+1} R_k^T t_k)
            rk, tk = poses[k]
            rk1, tk1 = poses[k + 1]
            r_rel = rk1 @ rk.T
            t_rel = tk1 - r_rel @ tk
            rel = out.relative[k]
            rot_dev = np.degrees(np.arccos(np.clip(
                (np.trace(r_rel @ np.asarray(rel.rotation).T) - 1) / 2,
                -1, 1)))
            t_dev = float(np.linalg.norm(np.asarray(rel.translation)
                                         - t_rel))
            print(
                f"pair {k}: iters={int(out.iterations[k]):3d} "
                f"err={float(out.errors[k]):.5f} rot_dev={rot_dev:6.3f}d "
                f"t_dev={t_dev:.4f}", flush=True
            )


if __name__ == "__main__":
    main()
