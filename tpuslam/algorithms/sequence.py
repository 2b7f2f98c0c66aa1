"""Sequential scan registration (odometry): align a stream of clouds
pairwise and compose absolute poses.

Beyond-reference scope (the reference registers exactly one pair per
process, ``mainwrapper.cpp:5-54``): the production SLAM workload is a
SEQUENCE of scans, each close to its predecessor.  Two lowerings:

* **sequential** (default): consecutive pairs run through
  ``icp_register`` one by one, each SEEDED with the previous pair's
  relative transform through the ``ICPResume`` carry (constant-velocity
  prior — scan k+1 tends to continue scan k's motion).  All pairs share
  one padded shape, so the whole stream reuses a single compiled
  program; the seed removes the large-motion iterations entirely —
  measured on the chip at 20 scans x 100k: 1.0 mean ICP iterations/pair
  seeded vs 9.7 unseeded, with BETTER trajectory drift (RMS 0.0026 vs
  0.0043 over 19 steps of ~0.5-unit motion), wall 1.07x (per-pair
  dispatch latency, not iterations, bounds the wall at this scale)
  (``bench_results/sequence_100k.json``, ``tools/sequence_bench.py``).
* **batched**: all pairs in one ``icp_register_batch`` program (vmapped
  or unrolled by the measured crossover).  No cross-pair seeding — use
  when throughput beats per-pair latency and motion is small.

Absolute poses compose homogeneously: ``T_k = T_{k-1} ∘ rel_k`` with
``rel_k`` mapping scan k to scan k+1's frame (the reference transform
direction: ``before -> after``).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from tpuslam.algorithms.icp import FLT_MAX, ICPResume, icp_register
from tpuslam.core.types import Cloud, RigidTransform, pad_cloud, round_up


class SequenceResult(NamedTuple):
    """Per-pair relative transforms + composed absolute poses.

    ``relative``: K transforms, scan k -> scan k+1 frame.
    ``absolute``: K+1 poses, scan k -> scan 0 frame (pose 0 = identity).
    ``iterations`` / ``errors``: per-pair registration diagnostics.
    """

    relative: List[RigidTransform]
    absolute: List[RigidTransform]
    iterations: np.ndarray  # i32[K]
    errors: np.ndarray  # f32[K]


def _compose(a: RigidTransform, b: RigidTransform) -> RigidTransform:
    """a ∘ b: apply b, then a (homogeneous composition; unit scale —
    odometry steps are rigid)."""
    return RigidTransform(
        rotation=a.rotation @ b.rotation,
        translation=a.rotation @ b.translation + a.translation,
        scale=np.float32(1.0),
    )


def _invert(t: RigidTransform) -> RigidTransform:
    rt = t.rotation.T
    return RigidTransform(rotation=rt, translation=-(rt @ t.translation),
                          scale=np.float32(1.0))


def register_sequence(
    clouds: Sequence[np.ndarray],
    eps: float = 1e-3,
    max_distance_squared: float = 1000.0,
    max_iterations: int = 50,
    seed_with_previous: bool = True,
    batch: bool = False,
    use_spatial: Optional[bool] = None,
) -> SequenceResult:
    """Register ``clouds[k] -> clouds[k+1]`` for every consecutive pair
    and compose the absolute trajectory.  Clouds are host arrays (or
    Clouds) of possibly different sizes; all are padded to one common
    lane-aligned shape so every pair reuses the same compiled program."""
    if len(clouds) < 2:
        raise ValueError("register_sequence needs at least two clouds")
    arrs = [
        np.asarray(c.points[: int(c.count)] if isinstance(c, Cloud) else c,
                   np.float32)
        for c in clouds
    ]
    npad = max(round_up(max(len(a), 1), 128) for a in arrs)
    padded = [pad_cloud(a, multiple=npad) for a in arrs]

    if batch:
        from tpuslam.algorithms.batch import icp_register_batch, stack_clouds

        bb = stack_clouds(arrs[:-1], multiple=npad)
        ba = stack_clouds(arrs[1:], multiple=npad)
        out = icp_register_batch(
            bb, ba, eps=eps,
            max_distance_squared=max_distance_squared,
            max_iterations=max_iterations, use_spatial=use_spatial,
        )
        rels = [
            RigidTransform(
                rotation=np.asarray(out.transform.rotation[k]),
                translation=np.asarray(out.transform.translation[k]),
                scale=np.float32(1.0),
            )
            for k in range(len(arrs) - 1)
        ]
        iters = np.asarray(out.iterations)
        errs = np.asarray(out.error)
    else:
        rels, iters_l, errs_l = [], [], []
        prev_dev = None  # previous pair's (rotation, translation), ON DEVICE
        for k in range(len(arrs) - 1):
            resume = None
            if seed_with_previous and prev_dev is not None:
                # constant-velocity prior: start from the previous
                # pair's relative motion, handed over as the previous
                # result's DEVICE arrays (a host round-trip per pair
                # costs ~0.5 s through a relayed backend)
                resume = ICPResume(
                    rotation=prev_dev[0],
                    translation=prev_dev[1],
                    error=jnp.float32(1e5),
                    nn=None,
                    done_before=jnp.int32(0),
                    prev_error=jnp.float32(FLT_MAX),
                )
            # seeded pairs replace the reference's stop-on-first-error-
            # increase guard with patience=8 best-so-far semantics: a
            # warm start sits immediately in the near-optimum regime
            # where the correspondence error fluctuates, so the guard
            # fires on noise after ~2 iterations and returns seed
            # quality (measured drift RMS 3.1 vs 0.50 unseeded at
            # 20x100k, tools/probe_seq_seed.py); an estimated seed can
            # also plateau for several iterations before descending
            # further, so patience must ride out the plateau (patience=3
            # still lost 2x per-pair accuracy; 8 costs ~40 ms of extra
            # iterations at 100k against ~1 unit of trajectory drift)
            r = icp_register(
                padded[k], padded[k + 1], eps=eps,
                max_distance_squared=max_distance_squared,
                max_iterations=max_iterations, use_spatial=use_spatial,
                resume=resume,
                divergence_guard=resume is None,
                patience=0 if resume is None else 8,
            )
            rel = RigidTransform(
                rotation=np.asarray(r.transform.rotation),
                translation=np.asarray(r.transform.translation),
                scale=np.float32(1.0),
            )
            rels.append(rel)
            prev_dev = (r.transform.rotation, r.transform.translation)
            iters_l.append(int(r.iterations))
            errs_l.append(float(r.error))
        iters = np.asarray(iters_l, np.int32)
        errs = np.asarray(errs_l, np.float32)

    # scan k's points in scan 0's frame: T_k = rel_1^-1 ∘ ... — the
    # relative transform maps k INTO k+1's frame, so the pose of frame
    # k+1 expressed in frame 0 composes the INVERSES:
    # x_{k+1} = rel_k(x_k)  =>  x_0 = T_k(x_k), T_{k+1} = T_k ∘ rel_k^-1
    eye = RigidTransform(
        rotation=np.eye(3, dtype=np.float32),
        translation=np.zeros(3, np.float32),
        scale=np.float32(1.0),
    )
    absolute = [eye]
    for rel in rels:
        absolute.append(_compose(absolute[-1], _invert(rel)))
    return SequenceResult(
        relative=rels, absolute=absolute, iterations=iters, errors=errs
    )
