"""Stage-level timing of the hierarchical NN at the 1M+ ICP rungs
(VERDICT r2 #2: diagnose where the 2.0 s/iter goes at 1.3M).

Replicates nearest_neighbors_hier's internals stage by stage on a WARM
trajectory state (one real ICP iteration of motion), timing each as its
own jitted dispatch:

  A  bound pass (chunked dc2 -> ub -> admissibility table)
  B  candidate build (key sort + compaction + cummax)
  C  rescore kernel (sparse arm)
  D  dense kernel (the overflow fallback / cold arm)
  E  full hier call (sanity: ~ A+B+C)
  F  full ICP iteration body (E + gather + procrustes + transform)

plus the admissible-count distribution (mean/p99/max vs the L budget)
and the overflow flag.  Usage: python tools/stage_1m.py [N] [g] [gsrc] [L]
"""

from __future__ import annotations

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

from tpuslam.core.types import pad_cloud, round_up
from tpuslam.data.synthesis import (
    get_random_rotation_matrix,
    get_random_translation_vector,
)


def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])


def timeit(fn, reps=3):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_310_720
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    gsrc = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    l_budget = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from tpuslam.ops import nn_hier as H
    from tpuslam.ops.nn_hier import (
        _center_dc2,
        hier_state_init,
        nearest_neighbors_hier,
        prepare_hier_target,
        table_width,
    )
    from tpuslam.ops.procrustes import weighted_procrustes
    from tpuslam.ops.spatial import morton_permutation

    g = g or H.DEFAULT_G
    gsrc = gsrc or H.DEFAULT_GSRC
    l_budget = l_budget or H.DEFAULT_L

    rng = np.random.Generator(np.random.PCG64(666))
    before = (rng.random((n, 3), dtype=np.float64) * 10.0).astype(np.float32)
    r = get_random_rotation_matrix(rng, 0.2)
    t = get_random_translation_vector(rng, 10.0)
    after = (before @ r.T + t)[rng.permutation(n)].astype(np.float32)
    cb, ca = pad_cloud(before), pad_cloud(after)

    n0, m0 = cb.points.shape[0], ca.points.shape[0]
    n_pad, m_pad = round_up(n0, gsrc), round_up(m0, g)
    b_pts = jnp.pad(cb.points, ((0, n_pad - n0), (0, 0)))
    src_mask = jnp.pad(cb.mask(), (0, n_pad - n0))
    a_pts = jnp.pad(ca.points, ((0, m_pad - m0), (0, 0)))
    a_mask = jnp.pad(ca.mask(), (0, m_pad - m0))
    perm_s = morton_permutation(b_pts, src_mask)
    src = b_pts[perm_s]
    src_mask = src_mask[perm_s]
    target = prepare_hier_target(a_pts, a_mask, ca.count, g=g)
    jax.block_until_ready(target.packed)
    c = m_pad // g
    ts = n_pad // gsrc
    width = table_width(m_pad, g, l_budget)
    print(f"N={n_pad} M={m_pad} g={g} gsrc={gsrc} L={l_budget} "
          f"C={c} Ts={ts} width={width}", flush=True)

    # drive one REAL warm trajectory step: cold call (dense), apply one
    # procrustes step, warm call -> the state a steady-state iteration
    # sees
    state = hier_state_init(n_pad)

    @jax.jit
    def one_icp(pts, rot, tr, st):
        transformed = pts @ rot.T + tr
        idx, dist, st = nearest_neighbors_hier(
            transformed, src_mask, target, st,
            l_budget=l_budget, g=g, gsrc=gsrc,
        )
        matched = target.original_points[idx]
        w = jnp.logical_and(dist < 1e18, src_mask > 0).astype(jnp.float32)
        r_step, t_step = weighted_procrustes(transformed, matched, w)
        return r_step @ rot, r_step @ tr + t_step, st, dist

    rot, tr = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
    for k in range(3):
        t0 = time.perf_counter()
        rot, tr, state, dist = one_icp(src, rot, tr, state)
        read(dist)
        print(f"  icp it{k}: {(time.perf_counter()-t0)*1e3:8.1f} ms "
              f"sparse={bool(np.asarray(state.sparse))}", flush=True)
    warm_pts = src @ rot.T + tr  # steady-state query positions

    # ---- stage A: bound pass (replicates nearest_neighbors_hier) -----
    bound_chunk_elems = 64 * 1024 * 1024

    @jax.jit
    def stage_a(pts, st):
        def bound_chunk(args):
            pos, mask_c, prev_target = args
            rows = pos.shape[0]
            dc2, eps = _center_dc2(pos, target)
            radii = target.radii
            ub = jnp.min(
                jnp.sqrt(jnp.maximum(dc2, 0.0) + eps) + radii[None, :],
                axis=1,
            )
            ub_warm = (
                jnp.linalg.norm(pos - prev_target, axis=-1)
                * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
            )
            ub = jnp.where(st.warm, jnp.minimum(ub, ub_warm), ub)
            ub = ub * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-6)
            thresh = (ub[:, None] + radii[None, :]) ** 2 + eps
            adm = jnp.logical_and(dc2 <= thresh, (mask_c > 0)[:, None])
            return jnp.any(adm.reshape(rows // gsrc, gsrc, c), axis=1)

        rows_per_chunk = max(
            gsrc, (bound_chunk_elems // max(c, 1)) // gsrc * gsrc
        )
        if rows_per_chunk >= n_pad:
            return bound_chunk((pts, src_mask, st.prev_target))
        n_chunks = -(-n_pad // rows_per_chunk)
        pad = n_chunks * rows_per_chunk - n_pad

        def chunked(x):
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            return x.reshape((n_chunks, rows_per_chunk) + x.shape[1:])

        return jax.lax.map(
            bound_chunk,
            (chunked(pts), chunked(src_mask), chunked(st.prev_target)),
        ).reshape(-1, c)[:ts]

    adm_tile = stage_a(warm_pts, state)
    counts = np.asarray(jnp.sum(adm_tile, axis=1))
    l_eff = min(l_budget, c)
    print(f"  counts: mean={counts.mean():.1f} p50={np.percentile(counts,50):.0f} "
          f"p99={np.percentile(counts,99):.0f} max={counts.max()} "
          f"budget={l_eff} overflow={counts.max() > l_eff}", flush=True)
    dt = timeit(lambda i: stage_a(warm_pts * (1.0 + 1e-7 * i), state))
    print(f"A bound pass      : {dt*1e3:8.1f} ms", flush=True)

    # ---- stage B: candidate build -------------------------------------
    @jax.jit
    def stage_b(adm):
        key = jnp.where(
            adm, jnp.arange(c, dtype=jnp.int32)[None, :], jnp.int32(c)
        )
        cand = jnp.sort(key, axis=1)[:, :min(width, c)]
        cand = jnp.where(cand < c, cand, jnp.int32(-1))
        if width > c:
            cand = jnp.pad(
                cand, ((0, 0), (0, width - c)), constant_values=-1
            )
        return jnp.maximum(jax.lax.cummax(cand, axis=1), 0)

    adm_dev = jnp.asarray(adm_tile)
    cand = stage_b(adm_dev)
    dt = timeit(lambda i: stage_b(
        jnp.logical_and(adm_dev, (jnp.float32(1.0 + 1e-7 * i) > 0))
    ))
    print(f"B candidate build : {dt*1e3:8.1f} ms", flush=True)

    # ---- stage C: rescore kernel ---------------------------------------
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    counts_dev = jnp.minimum(jnp.sum(adm_dev, axis=1).astype(jnp.int32),
                             l_eff)

    @jax.jit
    def stage_c(pts):
        idx, dist = nearest_neighbors_cand(
            pts, target.packed, cand, counts_dev, g=g, gsrc=gsrc
        )
        return dist

    dt = timeit(lambda i: stage_c(warm_pts * (1.0 + 1e-7 * i)))
    print(f"C rescore kernel  : {dt*1e3:8.1f} ms", flush=True)

    # ---- stage D: dense kernel (skippable — known-slow at 1M+) ----------
    if not os.environ.get("SKIP_DENSE"):
        from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

        @jax.jit
        def stage_d(pts):
            idx, dist = nearest_neighbors_pallas(
                pts, target.original_points, target.count
            )
            return dist

        dt = timeit(lambda i: stage_d(warm_pts * (1.0 + 1e-7 * i)), reps=1)
        print(f"D dense kernel    : {dt*1e3:8.1f} ms", flush=True)

    # ---- stage E: full hier call ----------------------------------------
    @jax.jit
    def stage_e(pts, st):
        idx, dist, st = nearest_neighbors_hier(
            pts, src_mask, target, st, l_budget=l_budget, g=g, gsrc=gsrc
        )
        return dist

    dt = timeit(lambda i: stage_e(warm_pts * (1.0 + 1e-7 * i), state))
    print(f"E full hier call  : {dt*1e3:8.1f} ms", flush=True)

    # ---- stage F: full ICP iteration body --------------------------------
    dt = timeit(lambda i: one_icp(
        src * (1.0 + 1e-7 * i), rot, tr, state)[3])
    print(f"F full ICP iter   : {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
