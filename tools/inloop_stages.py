"""Amortized in-loop stage costs of the hier NN at 100k.

Each stage runs CHAIN times inside one jitted fori_loop with a data
dependency between iterations (position perturbed per step, a scalar of
the stage output folded into the carry), so per-dispatch relay overhead
amortizes away and XLA sees the stage exactly as the ICP loop does.
Timing: distinct inputs per rep, device-value read bracketing.
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

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.core.types import pad_cloud
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)
from tpuslam.ops.nn_hier import (
    _center_dc2,
    hier_state_init,
    nearest_neighbors_hier,
    prepare_hier_target,
    table_width,
)
from tpuslam.ops.procrustes import weighted_procrustes
from tpuslam.ops.spatial import morton_permutation

N = 102_400
G, GSRC, L = 256, 512, 160
CHAIN = 50
WARMUP_ITERS = 12


def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])


def timeit(fn, reps=3):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps / CHAIN


def main():
    rng = np.random.Generator(np.random.PCG64(666))
    before = (rng.random((N, 3), dtype=np.float64) * 10.0).astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    after = (before @ r.T + t)[rng.permutation(N)].astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)

    mask_s = cb.mask()
    perm_s = morton_permutation(cb.points, mask_s)
    src = cb.points[perm_s]
    src_mask = mask_s[perm_s]
    target = prepare_hier_target(ca.points, ca.mask(), ca.count, g=G)
    state = hier_state_init(src.shape[0])

    @jax.jit
    def step(rot, trans, state):
        transformed = src @ rot.T + trans
        idx, dist, state = nearest_neighbors_hier(
            transformed, src_mask, target, state,
            l_budget=L, g=G, gsrc=GSRC,
        )
        matched = ca.points[idx % ca.points.shape[0]]
        rot_s, trans_s = weighted_procrustes(transformed, matched, src_mask)
        return rot_s @ rot, rot_s @ trans + trans_s, state, dist

    rot, trans = jnp.eye(3), jnp.zeros(3)
    for _ in range(WARMUP_ITERS):
        rot, trans, state, dist = step(rot, trans, state)
    read(dist)
    transformed = src @ rot.T + trans

    c = target.packed.shape[0] // G
    ts = N // GSRC
    width = table_width(target.packed.shape[0], G, L)
    l_eff = min(L, c)
    radii = target.radii

    def bound_body(pos):
        dc2, eps = _center_dc2(pos, target)
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
        return jnp.any(adm.reshape(pos.shape[0] // GSRC, GSRC, c), axis=1)

    def table_body(adm_tile, counts):
        cum = jnp.cumsum(adm_tile.astype(jnp.int32), axis=1)
        slots = jnp.arange(width, dtype=jnp.int32)
        cand = jnp.sum(
            (cum[:, :, None] <= slots[None, None, :]).astype(jnp.int32),
            axis=1,
        )
        cand = jnp.where(
            slots[None, :] < jnp.minimum(counts, width)[:, None],
            cand, jnp.int32(-1),
        )
        return jnp.maximum(jax.lax.cummax(cand, axis=1), 0)

    def table_body_sort(adm_tile, counts):
        key = jnp.where(
            adm_tile, jnp.arange(c, dtype=jnp.int32)[None, :], jnp.int32(c)
        )
        cand = jnp.sort(key, axis=1)[:, : min(width, c)]
        cand = jnp.where(cand < c, cand, jnp.int32(-1))
        return jnp.maximum(jax.lax.cummax(cand, axis=1), 0)

    adm0 = bound_body(transformed)
    counts0 = jnp.sum(adm0, axis=1).astype(jnp.int32)
    cand0 = table_body(adm0, counts0)
    counts_cl0 = jnp.minimum(counts0, l_eff)

    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    def chain(stage):
        """stage: pos -> scalar; fold the scalar into the next position."""

        @jax.jit
        def run(seed):
            def body(i, carry):
                pos, acc = carry
                s = stage(pos * (1.0 + 1e-6 * (i % 7).astype(jnp.float32)))
                return pos, acc + s

            _, acc = jax.lax.fori_loop(
                0, CHAIN, body,
                (transformed * (1.0 + 1e-5 * jnp.float32(seed)), 0.0),
            )
            return acc

        return run

    def bt(pos):
        adm = bound_body(pos)
        counts = jnp.sum(adm, axis=1).astype(jnp.int32)
        return jnp.float32(table_body(adm, counts)[0, 0])

    def bt_sort(pos):
        adm = bound_body(pos)
        counts = jnp.sum(adm, axis=1).astype(jnp.int32)
        return jnp.float32(table_body_sort(adm, counts)[0, 0])

    stages = {
        "bound": lambda pos: jnp.float32(
            jnp.sum(bound_body(pos).astype(jnp.int32))
        ),
        "bound+table": bt,
        "bound+table_SORT": bt_sort,
        "rescore(fixed)": lambda pos: nearest_neighbors_cand(
            pos, target.packed, cand0, counts_cl0, g=G, gsrc=GSRC
        )[1][0],
        "nn_full": lambda pos: nearest_neighbors_hier(
            pos, src_mask, target, state, l_budget=L, g=G, gsrc=GSRC
        )[1][0],
        "full_iter": None,  # below
    }

    def full_iter(pos):
        idx, dist, _ = nearest_neighbors_hier(
            pos, src_mask, target, state, l_budget=L, g=G, gsrc=GSRC
        )
        matched = ca.points[idx % ca.points.shape[0]]
        rot_s, trans_s = weighted_procrustes(pos, matched, src_mask)
        return trans_s[0] + dist[0]

    stages["full_iter"] = full_iter

    for name, stage in stages.items():
        dt = timeit(chain(stage))
        print(f"{name:18s} {dt*1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
