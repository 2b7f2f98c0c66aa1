"""Sweep the candidate-rescore kernel and bound-pass design parameters
on v5e.  Variants: slots-per-step S, source lane width gsrc, concat vs
per-slot folding, and a bf16-output bound matmul."""

import os
import sys
import time
import functools

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 102_400
G = 256
BIG = 3.4e38


def read(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, reps=5):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps


def make_cand_kernel(g, slots, style):
    def fold(d, orig, valid, dist_ref, idx_ref):
        d = jnp.where(valid, d, BIG)
        tile_min = jnp.min(d, axis=0, keepdims=True)
        masked = jnp.where(
            jnp.logical_and(d == tile_min, valid), orig, BIG
        )
        tile_arg = jnp.min(masked, axis=0, keepdims=True)
        better = jnp.logical_or(
            tile_min < dist_ref[:],
            jnp.logical_and(
                tile_min == dist_ref[:], tile_arg < idx_ref[:]
            ),
        )
        dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
        idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])

    def dist_of(t, sT):
        d = (t[:, 0:1] - sT[0:1, :]) ** 2
        d += (t[:, 1:2] - sT[1:2, :]) ** 2
        d += (t[:, 2:3] - sT[2:3, :]) ** 2
        return d

    def kernel(count_ref, cand_ref, srcT_ref, *refs):
        t_refs = refs[:slots]
        dist_ref, idx_ref = refs[slots:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            dist_ref[:] = jnp.full_like(dist_ref, BIG)
            idx_ref[:] = jnp.full_like(idx_ref, BIG)

        sT = srcT_ref[:]
        local = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0)
        if style == "concat":
            t = jnp.concatenate([r[:] for r in t_refs], axis=0)
            parts = []
            for r in range(slots):
                c_r = cand_ref[i, j * slots + r]
                parts.append(jnp.logical_and(
                    c_r >= 0, c_r * g + local < count_ref[0]))
            valid = jnp.concatenate(parts, axis=0)
            fold(dist_of(t, sT), t[:, 3:4], valid, dist_ref, idx_ref)
        else:  # per-slot
            for r in range(slots):
                c_r = cand_ref[i, j * slots + r]
                t = t_refs[r][:]
                valid = jnp.logical_and(
                    c_r >= 0, c_r * g + local < count_ref[0])
                fold(dist_of(t, sT), t[:, 3:4], valid, dist_ref,
                     idx_ref)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("g", "gsrc", "slots", "style")
)
def cand_run(src_sorted, tgt_packed, tgt_count, candidates, g, gsrc,
             slots, style):
    n, m = src_sorted.shape[0], tgt_packed.shape[0]
    ts, l_slots = candidates.shape
    count = jnp.asarray(tgt_count, jnp.int32).reshape(1)

    def t_spec(r):
        return pl.BlockSpec(
            (g, 4),
            lambda i, j, c, cr, r=r: (
                jnp.maximum(cr[i, j * slots + r], 0), 0
            ),
        )

    dist, idxf = pl.pallas_call(
        make_cand_kernel(g, slots, style),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ts, l_slots // slots),
            in_specs=[
                pl.BlockSpec((3, gsrc), lambda i, j, c, cr: (0, i)),
                *[t_spec(r) for r in range(slots)],
            ],
            out_specs=[
                pl.BlockSpec((1, gsrc), lambda i, j, c, cr: (0, i)),
                pl.BlockSpec((1, gsrc), lambda i, j, c, cr: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
    )(count, candidates, src_sorted.T, *([tgt_packed] * slots))
    return dist



def main():
    from tpuslam.core.types import pad_cloud
    from tpuslam.ops.nn_hier import prepare_hier_target, _center_dc2
    from tpuslam.ops.spatial import morton_permutation
    from tpuslam.kernels.pallas_nn_cand import nearest_neighbors_cand

    rng = np.random.default_rng(0)
    src = (rng.random((N, 3)) * 10.0 - 5.0).astype(np.float32)
    tgt = (rng.random((N, 3)) * 10.0 - 5.0).astype(np.float32)
    cb, ca = pad_cloud(src), pad_cloud(tgt)
    mask_s = cb.mask()
    perm = morton_permutation(cb.points, mask_s)
    src_sorted = cb.points[perm]
    pert = jax.jit(lambda x, i: x * (1.0 + 1e-5 * i))

    # equal candidate VOLUME across configs: live tiles x g = 12288 rows
    for g, gsrc, slots in [
        (256, 256, 8),
        (256, 512, 8),
        (512, 256, 4),
        (512, 512, 4),
        (1024, 512, 2),
        (256, 1024, 8),
    ]:
        target = prepare_hier_target(ca.points, ca.mask(), ca.count, g=g)
        ts = src_sorted.shape[0] // gsrc
        live = 12288 // g
        cand = jnp.tile(
            jnp.arange(live, dtype=jnp.int32)[None, :], (ts, 1)
        )

        counts = jnp.full((ts,), live, dtype=jnp.int32)  # all slots live

        def run(i, cand=cand, counts=counts, target=target, g=g,
                gsrc=gsrc, slots=slots):
            _, d = nearest_neighbors_cand(
                pert(src_sorted, jnp.float32(i)), target.packed,
                cand, counts, g=g, gsrc=gsrc, slots=slots)
            return d

        t = timeit(run)
        print(f"cand g={g:4d} gsrc={gsrc:4d} S={slots}: "
              f"{t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
