"""Is the dense NN kernel VPU-bound or HBM-bound?

Hypothesis: a ``[M, 3]`` f32 operand is lane-padded to 128 in HBM, so a
``(bm, 3)`` BlockSpec DMA moves ``bm * 128 * 4`` bytes — 42x the logical
12 bytes/row.  The dense kernel re-reads the whole target per source
tile: traffic = (N/bn) * M * 512 B = 26 GB at 100k with bn=2048, which
at ~750 GB/s is ~35 ms — suspiciously equal to the measured kernel
time.  If true the kernel is DMA-bound and the "VPU speed-of-light"
roofline in docs/DESIGN.md is wrong.

Tests:
  1. Clone of the production kernel at several (bn, bm): if time scales
     with N/bn (traffic) and not with compute (constant), it is
     HBM-bound.
  2. VPU peak probe: a long fused FMA chain on a resident array — the
     f32 VPU rate XLA actually achieves, for the roofline.

Timing follows the axon rules (distinct inputs, value-read bracket).
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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = M = 102_400
BIG = 3.4e38
IMAX = 2**31 - 1


def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])


def timeit(fn, reps=5):
    read(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read(out)
    return (time.perf_counter() - t0) / reps


def _kernel(srcT_ref, tgt_ref, dist_ref, idx_ref):
    j = pl.program_id(1)
    bm = tgt_ref.shape[0]
    bn = srcT_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dist_ref[:] = jnp.full_like(dist_ref, BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    sT = srcT_ref[:]
    t = tgt_ref[:]
    d = (t[:, 0:1] - sT[0:1, :]) ** 2
    d += (t[:, 1:2] - sT[1:2, :]) ** 2
    d += (t[:, 2:3] - sT[2:3, :]) ** 2

    tile_min = jnp.min(d, axis=0, keepdims=True)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    masked_rows = jnp.where(d == tile_min, rows, IMAX)
    tile_arg = jnp.min(masked_rows, axis=0, keepdims=True) + j * bm

    better = tile_min < dist_ref[:]
    dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, tile_arg, idx_ref[:])


@functools.partial(jax.jit, static_argnames=("bn", "bm"))
def dense_nn(src, tgt, bn, bm):
    n, m = src.shape[0], tgt.shape[0]
    grid = (n // bn, m // bm)
    dist, idx = pl.pallas_call(
        _kernel,
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((3, bn), lambda i, j: (0, i)),
                pl.BlockSpec((bm, 3), lambda i, j: (j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, bn), lambda i, j: (0, i)),
                pl.BlockSpec((1, bn), lambda i, j: (0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ],
    )(jnp.swapaxes(src, 0, 1), tgt)
    return dist[0], idx[0]


def main():
    rng = np.random.Generator(np.random.PCG64(1))
    src = jnp.asarray(
        (rng.random((N, 3)) * 10).astype(np.float32)
    )
    tgt = jnp.asarray(
        (rng.random((M, 3)) * 10).astype(np.float32)
    )

    for bn, bm in [(2048, 1024), (1024, 1024), (4096, 512), (2048, 512)]:
        traffic_gb = (N / bn) * M * 512 / 1e9
        dt = timeit(
            lambda i, bn=bn, bm=bm: dense_nn(
                src * (1.0 + 1e-5 * i), tgt, bn=bn, bm=bm
            )[0]
        )
        gops = 13 * N * M / dt / 1e9
        print(
            f"bn={bn:5d} bm={bm:5d}: {dt*1e3:7.2f} ms  "
            f"padded-traffic {traffic_gb:5.1f} GB -> {traffic_gb/dt:6.0f} GB/s"
            f"  ({gops:5.0f} Gops/s)",
            flush=True,
        )

    # VPU peak: K fused FMAs on a resident [4096, 2048] f32 array
    x = jnp.asarray(rng.random((4096, 2048)).astype(np.float32))
    K = 200

    @jax.jit
    def fma_chain(x):
        y = x
        for _ in range(K):
            y = y * jnp.float32(1.0000001) + jnp.float32(1e-7)
        return y

    dt = timeit(lambda i: fma_chain(x * (1.0 + 1e-5 * i)))
    ops = 2 * K * x.size
    print(f"VPU fused FMA chain: {dt*1e3:.2f} ms -> {ops/dt/1e12:.2f} Tops/s f32")

    # same but min-fold flavored (cmp+select ~= the kernel's fold ops)
    @jax.jit
    def min_chain(x):
        y = x
        for _ in range(K):
            y = jnp.minimum(y * jnp.float32(1.0000001), y + jnp.float32(1e-7))
        return y

    dt = timeit(lambda i: min_chain(x * (1.0 + 1e-5 * i)))
    ops = 3 * K * x.size
    print(f"VPU mul+add+min chain: {dt*1e3:.2f} ms -> {ops/dt/1e12:.2f} Tops/s f32")


if __name__ == "__main__":
    main()
