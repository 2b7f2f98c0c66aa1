"""Isolate the in-loop multi-op-body penalty (round 5).

Measured: a while_loop body running the CHECKED candidate CPD E-step
costs ~2x its standalone rate at 376k and ~4x at 1.3M, while a body
that is one monolithic pallas call (dense E-step, FGT chain) runs
in-loop at its standalone rate.  This probe decomposes the candidate
body into arms and slope-times each as a fori_loop body (t13 - t3
over one compiled program):

  dense         — one dense pallas E-step call (control)
  cand_checked  — the full checked candidate body
  kernels_only  — the two candidate pallas calls + elementwise math,
                  with admission/tables PRECOMPUTED outside the loop
  tables_only   — bounds + admission + rank-count tables only (their
                  results consumed by a trivial sum; no pallas calls)

Whichever arm's in-loop rate blows past its standalone rate carries
the penalty.  Timing-only: the kernels_only/tables_only arms do not
produce meaningful registration results.

Run: ``python tools/probe_inloop_penalty.py [size]`` (default 376_401).
"""

from __future__ import annotations

import functools
import json
import math
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

from tpuslam.harness.measure import read_scalar, timeit  # noqa: E402


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 376_401

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    read_scalar(jnp.sum(jnp.ones((8, 128))))
    print(f"backend={jax.default_backend()} size={size}", flush=True)

    from tpuslam.algorithms.cpd import sigma_squared_init, uniform_constant
    from tpuslam.core.types import pad_cloud, round_up
    from tpuslam.data.loader import load_cloud
    from tpuslam.data.synthesis import normalize_cloud
    from tpuslam.kernels.pallas_cpd import SENTINEL, _TILE, cpd_estep_pallas
    from tpuslam.kernels.pallas_cpd_cand import (
        SLOTS,
        _build_cand_table,
        _denom_cand_kernel,
        _moments_cand_kernel,
        _super_factor,
        cpd_estep_cand,
    )
    from tpuslam.ops.spatial import host_morton_order, tile_bounds

    pts = normalize_cloud(
        load_cloud(f"synthetic://{size}").astype(np.float64), 10.0
    ).astype(np.float32)
    # pad straight to the kernel-block multiple (covers super-slots) so
    # the hand-built pallas arms share the wrappers' padded shape
    n_pad = round_up(size, _TILE * 8)
    p = np.zeros((n_pad, 3), np.float32)
    p[:size] = pts
    mv = jnp.asarray(p[host_morton_order(p, size)])
    mm = (jnp.arange(n_pad) < size).astype(jnp.float32)
    s2_0 = sigma_squared_init(mv, mm, mv, mm)
    s2 = s2_0 * 0.015  # the Hybrid switch sigma — the slow phase entry
    const = uniform_constant(s2, 0.1, jnp.float32(size), jnp.float32(size))
    results = {"size": size, "sigma2": float(s2)}

    def slope(label, body_fn):
        """body_fn(ty) -> (new_ty, scalar); fori_loop slope timing."""

        @functools.partial(jax.jit, static_argnames=("n",))
        def run_n(ty0, n):
            def body(_, carry):
                ty, acc = carry
                ty2, val = body_fn(ty)
                return ty2, acc + val

            _, acc = jax.lax.fori_loop(
                0, n, body, (ty0, jnp.float32(0.0))
            )
            return acc

        t3 = timeit(lambda i: run_n(mv * (1.0 + 1e-5 * i), 3), reps=2)
        t13 = timeit(lambda i: run_n(mv * (1.0 + 1e-5 * i), 13), reps=2)
        s = (t13 - t3) / 10.0
        results[f"{label}_iter_s"] = round(s, 4)
        results[f"{label}_t3_s"] = round(t3, 3)
        print(f"{label}: t3={t3:.3f} t13={t13:.3f} -> {s:.4f} s/iter",
              flush=True)

    # --- dense control ---------------------------------------------------
    def dense_body(ty):
        out = cpd_estep_pallas(ty, mm, mv, mm, s2, const, jnp.asarray(True))
        return ty * (1.0 + 1e-7) + out.px * 1e-12, out.error

    slope("dense", dense_body)

    # --- full checked candidate body -------------------------------------
    def cand_body(ty):
        out, _ = cpd_estep_cand(
            ty, mm, mv, mm, s2, const, jnp.asarray(True), checked=True
        )
        return ty * (1.0 + 1e-7) + out.px * 1e-12, out.error

    slope("cand_checked", cand_body)

    # --- shared static geometry for the split arms ------------------------
    m = n = n_pad
    tn = tm = n // _TILE
    s_m = _super_factor(tm, tn)
    s_n = _super_factor(tn, tm)
    tm_s, tn_s = tm // s_m, tn // s_n
    cap_m = max(512 * 1024 // 4 // tn, SLOTS)
    width_m = -(-min(tm_s, max(5 * tm_s // 8, 1), cap_m) // SLOTS) * SLOTS
    width_n = width_m  # symmetric here
    f_sub = next(f for f in (8, 4, 2, 1)
                 if (tn * f) * (tm * f) <= 64 * 1024 * 1024)
    sub = _TILE // f_sub
    d2_cut = -jnp.float32(math.log(1e-3)) * 2.0 * s2 * jnp.float32(1 + 1e-5)

    def admission(ty):
        tb_n = tile_bounds(mv, mm, sub)
        tb_m = tile_bounds(ty, mm, sub)
        diff = tb_n.centers[:, None, :] - tb_m.centers[None, :, :]
        cdist = jnp.sqrt(jnp.sum(diff * diff, -1))
        lb = jnp.maximum(
            cdist - tb_n.radii[:, None] - tb_m.radii[None, :], 0.0
        ) * jnp.float32(1 - 1e-5)
        lb = jnp.min(lb.reshape(tn, f_sub, tm, f_sub), axis=(1, 3))
        lb_m = lb.reshape(tn, tm_s, s_m).min(axis=2)
        lb_n = lb.reshape(tn_s, s_n, tm).min(axis=1)
        adm_m = (lb_m * lb_m) <= d2_cut
        adm_n = (lb_n * lb_n) <= d2_cut
        cn_ = jnp.sum(adm_m, 1).astype(jnp.int32)
        cm_ = jnp.sum(adm_n, 0).astype(jnp.int32)
        tbl_m = _build_cand_table(adm_m, jnp.minimum(cn_, width_m), width_m)
        tbl_n = _build_cand_table(adm_n.T, jnp.minimum(cm_, width_n),
                                  width_n)
        return cn_, cm_, tbl_m, tbl_n

    # --- tables_only ------------------------------------------------------
    def tables_body(ty):
        cn_, cm_, tbl_m, tbl_n = admission(ty)
        val = (jnp.sum(cn_) + jnp.sum(cm_)
               + jnp.sum(tbl_m[0]) + jnp.sum(tbl_n[0])).astype(jnp.float32)
        return ty * (1.0 + 1e-7), val

    slope("tables_only", tables_body)

    # --- kernels_only (tables precomputed OUTSIDE the loop) ---------------
    cn0, cm0, tblm0, tbln0 = jax.jit(admission)(mv)
    cn0 = jnp.minimum(cn0, width_m)
    cm0 = jnp.minimum(cm0, width_n)
    scalars = jnp.stack([
        -0.5 / s2, const, jnp.float32(1.0),
        jnp.full((), math.log(1e-3), jnp.float32),
    ]).reshape(1, 4)

    def kernels_body(ty):
        tys = jnp.where(mm[:, None] > 0, ty, SENTINEL)
        denom = pl.pallas_call(
            functools.partial(_denom_cand_kernel, s_m),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(tn, width_m // SLOTS),
                in_specs=[
                    pl.BlockSpec((1, 4), lambda i, j, ct, cr: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3, _TILE), lambda i, j, ct, cr: (0, i)),
                    *[pl.BlockSpec((s_m * _TILE, 3),
                                   lambda i, j, ct, cr, r=r: (
                                       cr[i, j * SLOTS + r], 0))
                      for r in range(SLOTS)],
                ],
                out_specs=pl.BlockSpec((1, _TILE),
                                       lambda i, j, ct, cr: (0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(cn0, tblm0, scalars, jnp.swapaxes(mv, 0, 1),
          *([tys] * SLOTS)).reshape(n)
        inv = mm / denom
        xw = jnp.concatenate(
            [mv, jnp.zeros((n, 1), jnp.float32), inv[:, None],
             mv * inv[:, None]], axis=1)
        acc = pl.pallas_call(
            functools.partial(_moments_cand_kernel, s_n),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(tm, width_n // SLOTS),
                in_specs=[
                    pl.BlockSpec((1, 4), lambda j, i, ct, cr: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((3, _TILE), lambda j, i, ct, cr: (0, j)),
                    *[pl.BlockSpec((s_n * _TILE, 8),
                                   lambda j, i, ct, cr, r=r: (
                                       cr[j, i * SLOTS + r], 0))
                      for r in range(SLOTS)],
                ],
                out_specs=pl.BlockSpec((4, _TILE),
                                       lambda j, i, ct, cr: (0, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((4, m), jnp.float32),
        )(cm0, tbln0, scalars, jnp.swapaxes(tys, 0, 1), *([xw] * SLOTS))
        return ty * (1.0 + 1e-7) + acc[1:4].T * 1e-12, jnp.sum(acc[0])

    slope("kernels_only", kernels_body)

    # standalone references for the same arms (single dispatch each)
    def sa(label, fn):
        dt = timeit(lambda i: fn(mv * (1.0 + 1e-5 * i))[1], reps=2)
        results[f"{label}_standalone_s"] = round(dt, 4)
        print(f"{label} standalone: {dt:.4f} s", flush=True)

    sa("dense", dense_body)
    sa("cand_checked", cand_body)
    sa("tables_only", jax.jit(tables_body))
    sa("kernels_only", jax.jit(kernels_body))

    out = os.path.abspath(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "bench_results", "inloop_penalty.json",
    ))
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
