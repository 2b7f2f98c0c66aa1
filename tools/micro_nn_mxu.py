"""Micro-benchmark: candidate formulations for the NN shortlist pass.

Decides how the MXU-assisted exact-NN shortlist (dense approximate
tile-min matrix A[target_tile, source]) should be computed on v5e:

  a) dense f32 FMA kernel (current production kernel) — the baseline;
  b) MXU matmul d' = [t, |t|^2] @ [-2s; 1] at K in {4, 12, 128};
  c) bf16 / f32 VPU FMA tile-min (no argmin bookkeeping).

Tile-min granularity is 64 target rows (8 sub-mins per 512-row step) so
the output block is (8, BN)-aligned.  Inputs stay device-resident and are
perturbed on-device (axon relay: fresh values per rep, value-read
bracketing; see tools/bench_report.py).
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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = M = 102400
BN = 1024
BM = 512
SUB = 64  # tile-min granularity (rows)


def read_scalar(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timeit(fn, reps=5):
    read_scalar(fn(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = fn(i)
    read_scalar(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def perturb(x, i):
    return x * (1.0 + 1e-5 * i.astype(x.dtype))


def _sub_mins(d):
    rows = [
        jnp.min(d[k * SUB:(k + 1) * SUB], axis=0, keepdims=True)
        for k in range(d.shape[0] // SUB)
    ]
    return jnp.concatenate(rows, axis=0)


# --- b) MXU matmul tile-min --------------------------------------------


def _mxu_kernel(taug_ref, saug_ref, amin_ref):
    d = jnp.dot(
        taug_ref[:], saug_ref[:], preferred_element_type=jnp.float32
    )  # [BM, BN]
    amin_ref[:] = _sub_mins(d)


@functools.partial(jax.jit, static_argnames=("k",))
def mxu_tile_min(taug, saug, k):
    # taug bf16 [M, k], saug bf16 [k, N] -> A f32 [M//SUB, N]
    return pl.pallas_call(
        _mxu_kernel,
        grid_spec=pl.GridSpec(
            grid=(N // BN, M // BM),
            in_specs=[
                pl.BlockSpec((BM, k), lambda i, j: (j, 0)),
                pl.BlockSpec((k, BN), lambda i, j: (0, i)),
            ],
            out_specs=pl.BlockSpec(
                (BM // SUB, BN), lambda i, j: (j, i)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((M // SUB, N), jnp.float32),
    )(taug, saug)


# --- c) VPU FMA tile-min -----------------------------------------------


def _fma_kernel(srcT_ref, tgt_ref, amin_ref):
    sT = srcT_ref[:]
    t = tgt_ref[:]
    d = ((t[:, 0:1] - sT[0:1, :]) ** 2).astype(jnp.float32)
    d += ((t[:, 1:2] - sT[1:2, :]) ** 2).astype(jnp.float32)
    d += ((t[:, 2:3] - sT[2:3, :]) ** 2).astype(jnp.float32)
    amin_ref[:] = _sub_mins(d)


@jax.jit
def fma_tile_min(srcT, tgt):
    return pl.pallas_call(
        _fma_kernel,
        grid_spec=pl.GridSpec(
            grid=(N // BN, M // BM),
            in_specs=[
                pl.BlockSpec((3, BN), lambda i, j: (0, i)),
                pl.BlockSpec((BM, 3), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (BM // SUB, BN), lambda i, j: (j, i)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((M // SUB, N), jnp.float32),
    )(srcT, tgt)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    src = (rng.random((N, 3)) * 10.0 - 5.0).astype(np.float32)
    tgt = (rng.random((M, 3)) * 10.0 - 5.0).astype(np.float32)

    from tpuslam.kernels.pallas_nn import nearest_neighbors_pallas

    # a) production dense kernel, device-resident inputs
    src_d = jax.device_put(jnp.asarray(src))
    tgt_d = jax.device_put(jnp.asarray(tgt))

    def run_dense(i):
        _, d = nearest_neighbors_pallas(
            perturb(src_d, jnp.float32(i)), tgt_d, jnp.int32(M)
        )
        return d

    t = timeit(run_dense)
    print(f"dense f32 prod kernel: {t*1e3:.2f} ms", flush=True)

    # b) MXU
    for k in (4, 8, 12, 128):
        taug = np.zeros((M, k), np.float32)
        taug[:, :3] = tgt
        taug[:, 3] = np.sum(tgt * tgt, -1)
        saug = np.zeros((k, N), np.float32)
        saug[:3] = -2.0 * src.T
        saug[3] = 1.0
        taug_b = jax.device_put(jnp.asarray(taug, jnp.bfloat16))
        saug_b = jax.device_put(jnp.asarray(saug, jnp.bfloat16))

        def run_mxu(i, k=k, taug_b=taug_b, saug_b=saug_b):
            return mxu_tile_min(
                taug_b, perturb(saug_b, jnp.float32(i)), k
            )

        t = timeit(run_mxu)
        print(f"mxu K={k:3d} tile-min:  {t*1e3:.2f} ms", flush=True)

    # c) FMA tile-min, bf16 and f32
    srcT_b = jax.device_put(jnp.asarray(src.T, jnp.bfloat16))
    tgt_b = jax.device_put(jnp.asarray(tgt, jnp.bfloat16))

    def run_bf16(i):
        return fma_tile_min(perturb(srcT_b, jnp.float32(i)), tgt_b)

    t = timeit(run_bf16)
    print(f"bf16 FMA tile-min:     {t*1e3:.2f} ms", flush=True)

    srcT_d = jax.device_put(jnp.asarray(src.T))

    def run_f32min(i):
        return fma_tile_min(perturb(srcT_d, jnp.float32(i)), tgt_d)

    t = timeit(run_f32min)
    print(f"f32  FMA tile-min:     {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
