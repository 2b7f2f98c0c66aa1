"""Per-iteration error trace of ONE seeded vs unseeded 100k pair (the
sequence bench's pair 3->4): does the seeded run's error plateau and
then keep dropping (patience too small) or plateau for good (bias)?
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
    import jax.numpy as jnp

    from tpuslam.algorithms.icp import FLT_MAX, ICPResume, icp_register
    from tpuslam.core.types import pad_cloud
    from tpuslam.data.loader import synthetic_cloud
    from tpuslam.data.synthesis import normalize_cloud

    n_points = 102_400
    parent_n = n_points * 3 // 2
    rng = np.random.Generator(np.random.PCG64(666))
    parent = normalize_cloud(
        synthetic_cloud(parent_n).astype(np.float64), 10.0
    ).astype(np.float32)[:parent_n]
    print(f"backend={jax.default_backend()}", flush=True)

    # poses 3 and 4 from the probe's trajectory recipe
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    axis = np.array([0.3, 1.0, 0.2])
    vel = np.array([0.45, 0.2, -0.1], np.float32)
    for k in range(1, 6):
        d_axis = axis + 0.1 * np.sin(0.4 * k) * np.array([1.0, 0, 0.5])
        dr = rot_axis_angle(d_axis, 0.05 + 0.01 * np.sin(0.7 * k))
        dt = vel + 0.05 * np.array(
            [np.sin(0.3 * k), np.cos(0.5 * k), np.sin(0.2 * k)],
            np.float32,
        )
        r_prev, t_prev = poses[-1]
        poses.append((dr @ r_prev, dr @ t_prev + dt))

    def scan(k):
        sel = np.random.Generator(np.random.PCG64(100 + k)).permutation(
            len(parent))[:n_points]
        r, t = poses[k]
        return (parent[sel] @ r.T + t).astype(np.float32)

    s3, s4 = scan(3), scan(4)
    # gt relative 3->4
    r3, t3 = poses[3]
    r4, t4 = poses[4]
    r_rel = r4 @ r3.T
    t_rel = t4 - r_rel @ t3
    # the "previous pair" (2->3) relative = the constant-velocity seed
    r2, t2 = poses[2]
    r_prev = r3 @ r2.T
    t_prev = t3 - r_prev @ t2

    b, a = pad_cloud(s3), pad_cloud(s4)

    def trace(label, resume):
        # per-iteration error by sweeping the iteration cap from the
        # SAME start (axon cannot run jax.debug.print host callbacks):
        # guard off, huge patience cap -> run exactly k iterations
        for k in range(1, 21):
            res = icp_register(
                b, a, eps=1e-4, max_distance_squared=1000.0,
                max_iterations=k, resume=resume,
                divergence_guard=False, patience=1000,
            )
            rot = np.asarray(res.transform.rotation)
            tr = np.asarray(res.transform.translation)
            rot_dev = np.degrees(np.arccos(np.clip(
                (np.trace(r_rel @ rot.T) - 1) / 2, -1, 1)))
            t_dev = float(np.linalg.norm(tr - t_rel))
            print(
                f"{label} k={k:2d}: iters={int(res.iterations):2d} "
                f"err={float(res.error):.6f} rot_dev={rot_dev:6.3f}d "
                f"t_dev={t_dev:.4f}", flush=True
            )

    print("--- unseeded", flush=True)
    trace("unseeded", None)

    seed = ICPResume(
        rotation=jnp.asarray(r_prev), translation=jnp.asarray(t_prev),
        error=jnp.float32(1e5), nn=None,
        done_before=jnp.int32(0), prev_error=jnp.float32(FLT_MAX),
    )
    print("--- seeded", flush=True)
    trace("seeded", seed)


if __name__ == "__main__":
    main()
