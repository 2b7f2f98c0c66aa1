"""Stage split of the warm-start hierarchical NN at 100k (VERDICT r3
item 3: push toward 120 it/s or prove the roofline).

Reconstructs a realistic steady-state ICP iteration (small residual
motion, warm bounds valid) and times each stage in isolation on the
chip, axon rules observed (distinct inputs per rep via f32-surviving
perturbation, device-value read bracketing):

  bound   — hi/lo MXU center-distance pass + admissibility -> counts
  table   — candidate-table build (sort + cummax compaction)
  rescore — pallas_nn_cand kernel at the steady-state candidate table
  nn_full — the whole nearest_neighbors_hier call
  fit     — procrustes + transform + matched-row gather (everything else
            in an ICP iteration)
  dense   — the dense Pallas kernel, for the fallback/base rate

Optionally sweeps (g, gsrc, L) for the rescore+bound pair at the same
steady state: ``python tools/stage_100k.py sweep``.
"""

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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.types import pad_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)
from tpuslam.ops.nn_hier import (
    HierState,
    _center_dc2,
    hier_state_init,
    nearest_neighbors_hier,
    prepare_hier_target,
    table_width,
)
from tpuslam.ops.procrustes import weighted_procrustes
from tpuslam.ops.spatial import morton_permutation

N = 102_400
WARMUP_ITERS = 12  # iterations before the measured steady state


def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])


def timeit(fn, reps=8):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps


def perturb(pts, i):
    return pts * (1.0 + 1e-5 * jnp.float32(i))


def build_pair():
    # default: the HEADLINE pair (model-substitute cloud, spread 10,
    # 0.2 rad / 10 transform — the exact protocol bench.py times), so
    # the stage budget explains the published it/s; ``uniform`` arg
    # keeps the structure-free worst case
    if "uniform" in sys.argv:
        rng = np.random.Generator(np.random.PCG64(666))
        before = (rng.random((N, 3), dtype=np.float64) * 10.0).astype(
            np.float32
        )
        r = get_random_rotation_matrix(rng, 0.2)
        t = get_random_translation_vector(rng, 10.0)
        after = (before @ r.T + t)[rng.permutation(N)].astype(np.float32)
        return pad_cloud(before), pad_cloud(after)
    from tpuslam.harness.measure import build_headline_pair

    return build_headline_pair(N)


def steady_state(cb, ca, g, gsrc, l_budget):
    """Run WARMUP_ITERS real ICP iterations; return (sorted source pts,
    mask, target, transformed-at-steady-state, warm HierState)."""
    mask_s = cb.mask()
    perm_s = morton_permutation(cb.points, mask_s)
    src = cb.points[perm_s]
    src_mask = mask_s[perm_s]
    target = prepare_hier_target(ca.points, ca.mask(), ca.count, g=g)
    state = hier_state_init(src.shape[0])

    @partial(jax.jit, static_argnames=())
    def step(rot, trans, state):
        transformed = src @ rot.T + trans
        idx, dist, state = nearest_neighbors_hier(
            transformed, src_mask, target, state,
            l_budget=l_budget, g=g, gsrc=gsrc,
        )
        matched = ca.points[idx % ca.points.shape[0]]
        rot_s, trans_s = weighted_procrustes(transformed, matched, src_mask)
        return rot_s @ rot, rot_s @ trans + trans_s, state, dist

    rot, trans = jnp.eye(3), jnp.zeros(3)
    for _ in range(WARMUP_ITERS):
        rot, trans, state, dist = step(rot, trans, state)
    read(dist)
    transformed = src @ rot.T + trans
    return src, src_mask, target, transformed, state


def bound_fn(target, src_mask, state, g, gsrc, l_budget):
    c = target.packed.shape[0] // g

    @jax.jit
    def run(pos):
        dc2, eps = _center_dc2(pos, target)
        radii = target.radii
        ub = jnp.min(
            jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii[None, :], axis=1
        )
        ub_warm = (
            jnp.linalg.norm(pos - state.prev_target, axis=-1)
            * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
        )
        ub = jnp.where(state.warm, jnp.minimum(ub, ub_warm), ub)
        ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
        thresh = (ub[:, None] + radii[None, :]) ** 2 + eps
        adm = jnp.logical_and(dc2 <= thresh, (src_mask > 0)[:, None])
        adm_tile = jnp.any(
            adm.reshape(pos.shape[0] // gsrc, gsrc, c), axis=1
        )
        return adm_tile, jnp.sum(adm_tile, axis=1).astype(jnp.int32)

    return run


def table_fn(c, width):
    @jax.jit
    def run(adm_tile):
        key = jnp.where(
            adm_tile, jnp.arange(c, dtype=jnp.int32)[None, :], jnp.int32(c)
        )
        cand = jnp.sort(key, axis=1)[:, : min(width, c)]
        cand = jnp.where(cand < c, cand, jnp.int32(-1))
        if width > c:
            cand = jnp.pad(
                cand, ((0, 0), (0, width - c)), constant_values=-1
            )
        return jnp.maximum(jax.lax.cummax(cand, axis=1), 0)

    return run


def main():
    sweep = len(sys.argv) > 1 and sys.argv[1] == "sweep"
    cb, ca = build_pair()

    configs = [(128, 1024, 256)]  # auto_tile_params(102400) production
    if sweep:
        configs = [
            (128, 1024, 256),  # production (round 3+)
            (256, 256, 160),   # round-2 default
            (128, 512, 256),
            (256, 1024, 256),
            (128, 1024, 160),
            (64, 1024, 256),
            (128, 1024, 512),
        ]

    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    for g, gsrc, l_budget in configs:
        src, src_mask, target, transformed, state = steady_state(
            cb, ca, g, gsrc, l_budget
        )
        c = target.packed.shape[0] // g
        width = table_width(target.packed.shape[0], g, l_budget)
        l_eff = min(l_budget, c)

        bound = bound_fn(target, src_mask, state, g, gsrc, l_budget)
        table = table_fn(c, width)
        adm_tile, counts = bound(transformed)
        cand = table(adm_tile)
        counts_cl = jnp.minimum(counts, l_eff)
        cn = np.asarray(counts)
        print(
            f"\n=== g={g} gsrc={gsrc} L={l_budget} (C={c}, width={width}) "
            f"counts mean={cn.mean():.1f} max={cn.max()} "
            f"rescored rows/src={cn.mean() * g:.0f}",
            flush=True,
        )

        t_bound = timeit(lambda i: bound(perturb(transformed, i))[1])
        t_table = timeit(
            lambda i: table(
                jnp.logical_or(adm_tile, (counts[:, None] + i) < 0)
            )
        )
        t_resc = timeit(
            lambda i: nearest_neighbors_cand(
                perturb(transformed, i), target.packed, cand, counts_cl,
                g=g, gsrc=gsrc,
            )[1]
        )

        @jax.jit
        def nn_full(pos):
            _, dist, _ = nearest_neighbors_hier(
                pos, src_mask, target, state,
                l_budget=l_budget, g=g, gsrc=gsrc,
            )
            return dist

        t_full = timeit(lambda i: nn_full(perturb(transformed, i)))

        @jax.jit
        def fit(pos):
            idx, dist, _ = nearest_neighbors_hier(
                pos, src_mask, target, state,
                l_budget=l_budget, g=g, gsrc=gsrc,
            )
            matched = ca.points[idx % ca.points.shape[0]]
            rot_s, trans_s = weighted_procrustes(pos, matched, src_mask)
            return rot_s @ jnp.eye(3), trans_s

        t_iter = timeit(lambda i: fit(perturb(transformed, i))[1])

        print(
            f"bound {t_bound*1e3:7.2f} ms | table {t_table*1e3:6.2f} ms | "
            f"rescore {t_resc*1e3:7.2f} ms | nn_full {t_full*1e3:7.2f} ms | "
            f"full_iter {t_iter*1e3:7.2f} ms",
            flush=True,
        )

    t_dense = timeit(
        lambda i: nearest_neighbors_pallas(
            perturb(transformed, i), target.original_points, target.count
        )[1]
    )
    print(f"\ndense kernel: {t_dense*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
