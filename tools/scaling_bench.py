"""Multi-chip scaling benchmark: points/sec for sharded ICP across
device-count rungs (1, 2, 4, ... all).

The BASELINE target is "points/s scaling measured at 1 chip, 1 host,
and N>=2 hosts with >=75% efficiency 1->2 hosts".  This harness is that
measurement, ready to run on a pod slice: for each device count it
builds a 1-D points-axis mesh (`tpuslam.parallel.mesh`), shards the
target cloud, replicates the source, and times a fixed-iteration
sharded ICP (`tpuslam.parallel.icp`) with the relay-safe protocol
(distinct inputs per rep, device->host value-read bracketing — see
tools/bench_report.py).

On this single-chip environment it records the 1-chip rung and marks
the sweep truncated; on a CPU virtual mesh (JAX_PLATFORMS=cpu +
--xla_force_host_platform_device_count=8, or TPUSLAM_SCALING_VIRTUAL=1)
it exercises the full sweep mechanics end-to-end, with numbers labeled
correctness-only (host cores are not chips).

Writes ``bench_results/scaling.json``:
    {"backend": ..., "cloud_size": N, "iters": K,
     "rungs": [{"devices": d, "iter_per_sec": ..., "mpoints_per_sec":
                ..., "efficiency_vs_1": ...}, ...],
     "complete_sweep": bool}
"""

from __future__ import annotations

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

ITERS = int(os.environ.get("TPUSLAM_SCALING_ITERS", "20"))
SIZE = int(os.environ.get("TPUSLAM_SCALING_SIZE", "204800"))
REPS = int(os.environ.get("TPUSLAM_SCALING_REPS", "3"))


def main() -> int:
    if os.environ.get("TPUSLAM_SCALING_VIRTUAL"):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tools.bench_report import timeit
    from tpuslam.core.types import Cloud
    from tpuslam.parallel.icp import icp_register_sharded
    from tpuslam.parallel.mesh import make_mesh, replicate_cloud, shard_cloud

    backend = jax.default_backend()
    devices = jax.devices()
    # virtual CPU "devices" are host cores sharing one memory system —
    # the sweep validates plumbing there, not scaling
    honest = backend == "tpu"

    rng = np.random.Generator(np.random.PCG64(7))
    src = (rng.random((SIZE, 3), np.float32) * 10.0).astype(np.float32)
    # target = rotated copy, so NN work is realistic (not degenerate)
    th = 0.2
    rot = np.array(
        [
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    tgt = (src @ rot.T + np.float32(1.0)).astype(np.float32)

    rungs = []
    d = 1
    counts = []
    while d <= len(devices):
        counts.append(d)
        d *= 2
    if counts[-1] != len(devices):
        counts.append(len(devices))

    base = None
    for d in counts:
        mesh = make_mesh(devices[:d])
        before = replicate_cloud(src, mesh)
        after = shard_cloud(tgt, mesh)

        def run(i, before=before, after=after, mesh=mesh):
            perturbed = Cloud(
                before.points * jnp.float32(1.0 + 1e-5 * i), before.count
            )
            res = icp_register_sharded(
                perturbed, after, mesh, eps=0.0,
                max_distance_squared=1e18, max_iterations=ITERS,
                divergence_guard=False,
                # per-shard warm-start hierarchical NN (the production
                # arm) on TPU; the CPU virtual mesh would run it in
                # Pallas interpret mode, far too slow for a sweep
                use_spatial=honest,
            )
            return res.error

        dt = timeit(run, reps=REPS)
        ips = ITERS / dt
        row = {
            "devices": d,
            "iter_per_sec": round(ips, 2),
            "mpoints_per_sec": round(ips * SIZE / 1e6, 2),
        }
        if base is None:
            base = ips
            row["efficiency_vs_1"] = 1.0
        else:
            row["efficiency_vs_1"] = round(ips / (base * d), 3)
        rungs.append(row)
        print(f"devices={d}: {row}", flush=True)

    out = {
        "backend": backend,
        "honest_numbers": honest,
        "cloud_size": SIZE,
        "iters": ITERS,
        "rungs": rungs,
        "complete_sweep": len(devices) > 1,
        "note": (
            "single-device environment: multi-chip rungs need a pod slice"
            if len(devices) == 1
            else (
                "virtual CPU mesh: plumbing/correctness only"
                if not honest
                else "measured on hardware"
            )
        ),
    }
    if not honest:
        # collectives-on-one-CPU timings carry no information and a
        # recorded file invites misreading (VERDICT r2 weak #7): print
        # only, never persist.  The predictive story lives in
        # tpuslam.parallel.comm_model (byte model verified against the
        # traced collectives) instead.
        print(json.dumps(out))
        print("virtual-mesh run: not persisted (plumbing check only)")
        return 0
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_results",
        "scaling.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
