"""Probe the matched-coordinate gather (``after.points[idx]``) that the
ICP loop performs each iteration.

Decides the ROADMAP "gather fusion" question empirically:
* cost of the gather standalone at 100k, random vs spatially-sorted
  indices — if sorted indices are much cheaper, emitting SORTED winner
  indices from the hier rescore kernel (a 4-op fold extension) and
  gathering from the Morton-sorted target pays;
* cost of a one-hot contraction alternative is NOT probed: it is an
  O(N*M) pass, the same cost class as the NN scan itself.

Run on TPU: ``python tools/probe_gather.py``.
"""

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

from bench_report import read_scalar, timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    read_scalar(jnp.sum(jnp.ones((8, 128))))  # prime a fresh worker
    print(f"backend={jax.default_backend()}")

    n = 102_400
    rng = np.random.Generator(np.random.PCG64(3))
    pts = jnp.asarray((rng.random((n, 3)) * 10.0).astype(np.float32))

    idx_rand = jnp.asarray(
        rng.integers(0, n, size=n, dtype=np.int64).astype(np.int32)
    )
    idx_sorted = jnp.sort(idx_rand)
    # near-sorted: sorted with +-8 local jitter (the realistic shape of
    # winner indices for Morton-adjacent sources)
    jitter = rng.integers(-8, 9, size=n).astype(np.int32)
    idx_near = jnp.clip(jnp.sort(idx_rand) + jnp.asarray(jitter), 0, n - 1)

    gather = jax.jit(lambda p, i: p[i].sum())

    for name, idx in (
        ("random", idx_rand),
        ("near-sorted", idx_near),
        ("sorted", idx_sorted),
    ):
        dt = timeit(lambda k, idx=idx: gather(pts * (1.0 + 1e-5 * k), idx))
        print(f"gather[{name}] {dt * 1000:.2f} ms at {n} rows")

    # the fused alternative inside the loop today: transform + gather +
    # weighted moments (what procrustes consumes) — measures how much of
    # the gather XLA already hides behind neighboring work
    w = jnp.ones((n,), jnp.float32)

    @jax.jit
    def moments(p, i):
        m = p[i]
        return (m * w[:, None]).sum(0), (p * m).sum()

    dt = timeit(lambda k: moments(pts * (1.0 + 1e-5 * k), idx_rand))
    print(f"gather+moments[random] {dt * 1000:.2f} ms")


if __name__ == "__main__":
    main()
