"""Rescore-kernel structure sweep at the 100k steady state.

The cand kernel sustains ~1.5 Tops/s vs the dense kernel's 3.2 — the
gap is grid-step overhead (dead steps beyond each group's live count)
and small [g, gsrc] tiles.  Sweep (slots/step, gsrc, g, L) with tables
rebuilt per config from the real steady-state admissibility, timing the
kernel amortized in a fori_loop chain (axon rules).
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
from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand
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

    # steady state trajectory under production params
    target0 = prepare_hier_target(ca.points, ca.mask(), ca.count, g=256)
    state = hier_state_init(src.shape[0])

    @jax.jit
    def step(rot, trans, state):
        transformed = src @ rot.T + trans
        idx, dist, state = nearest_neighbors_hier(
            transformed, src_mask, target0, state
        )
        matched = ca.points[idx % ca.points.shape[0]]
        rot_s, trans_s = weighted_procrustes(transformed, matched, src_mask)
        return rot_s @ rot, rot_s @ trans + trans_s, state, dist

    rot, trans = jnp.eye(3), jnp.zeros(3)
    for _ in range(WARMUP_ITERS):
        rot, trans, state, dist = step(rot, trans, state)
    read(dist)
    transformed = src @ rot.T + trans

    def build_table(g, gsrc, l_budget):
        """Admissibility + compacted table for this (g, gsrc, L) from
        the true steady state."""
        target = prepare_hier_target(ca.points, ca.mask(), ca.count, g=g)
        c = target.packed.shape[0] // g
        ts = N // gsrc
        width = table_width(target.packed.shape[0], g, l_budget)

        @jax.jit
        def build(pos):
            dc2, eps = _center_dc2(pos, target)
            radii = target.radii
            ub = jnp.min(
                jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii[None, :],
                axis=1,
            )
            ub_warm = (
                jnp.linalg.norm(pos - state.prev_target, axis=-1)
                * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
            )
            ub = jnp.where(state.warm, jnp.minimum(ub, ub_warm), ub)
            ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
            thresh = (ub[:, None] + radii[None, :]) ** 2 + eps
            adm = jnp.logical_and(dc2 <= thresh, (src_mask > 0)[:, None])
            adm_tile = jnp.any(adm.reshape(ts, gsrc, c), axis=1)
            counts = jnp.sum(adm_tile, axis=1).astype(jnp.int32)
            cum = jnp.cumsum(adm_tile.astype(jnp.int32), axis=1)
            slots_i = jnp.arange(width, dtype=jnp.int32)
            cand = jnp.sum(
                (cum[:, :, None] <= slots_i[None, None, :]).astype(
                    jnp.int32
                ),
                axis=1,
            )
            cand = jnp.where(
                slots_i[None, :] < jnp.minimum(counts, width)[:, None],
                cand, jnp.int32(-1),
            )
            cand = jnp.maximum(jax.lax.cummax(cand, axis=1), 0)
            return cand, counts

        cand, counts = build(transformed)
        return target, cand, counts, width

    configs = [
        # (g, gsrc, L, slots)
        (256, 512, 96, 8),
        (256, 512, 128, 8),
        (256, 512, 160, 4),
        (256, 1024, 160, 8),
        (256, 1024, 192, 8),
        (512, 512, 96, 8),
        (128, 1024, 256, 8),
    ]
    for g, gsrc, l_budget, slots in configs:
        target, cand, counts, width = build_table(g, gsrc, l_budget)
        l_eff = min(l_budget, target.packed.shape[0] // g)
        counts_cl = jnp.minimum(counts, l_eff)
        cn = np.asarray(counts)
        clipped = float(np.mean(cn > l_eff))
        pairs = float(np.minimum(cn, l_eff).mean()) * g * N

        @jax.jit
        def chain(seed, target=target, cand=cand, counts_cl=counts_cl,
                  g=g, gsrc=gsrc, slots=slots):
            def body(i, carry):
                pos, acc = carry
                _, dist = nearest_neighbors_cand(
                    pos * (1.0 + 1e-6 * (i % 7).astype(jnp.float32)),
                    target.packed, cand, counts_cl,
                    g=g, gsrc=gsrc, slots=slots,
                )
                return pos, acc + dist[0]

            _, acc = jax.lax.fori_loop(
                0, CHAIN, body,
                (transformed * (1.0 + 1e-5 * jnp.float32(seed)), 0.0),
            )
            return acc

        dt = timeit(chain)
        tops = pairs * 13 / dt / 1e12
        print(
            f"g={g:3d} gsrc={gsrc:3d} L={l_budget:3d} slots={slots:2d} "
            f"(counts mean={cn.mean():5.1f} max={cn.max():3d} "
            f"clip={clipped:4.2f}): {dt*1e3:7.3f} ms  {tops:5.2f} Tops/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
