"""Tile-parameter sweep for the hierarchical NN ICP path on the real chip.

Times a full 50-iteration warm-start ICP loop at ~100k points for each
(g target-tile rows, gsrc source-group rows, L candidate budget) triple,
following the axon timing rules (value-read bracketing, f32-surviving
input perturbation).  Usage: ``python tools/sweep_hier.py [N]``.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from tpuslam.core.types import pad_cloud, Cloud
from tpuslam.data.synthesis import get_random_rotation_matrix, get_random_translation_vector
from tpuslam.ops.nn_hier import prepare_hier_target, hier_state_init, nearest_neighbors_hier
from tpuslam.ops.spatial import morton_permutation
from tpuslam.ops.procrustes import weighted_procrustes

N = int(sys.argv[1]) if len(sys.argv) > 1 else 102_400
ITERS = 50
rng = np.random.Generator(np.random.PCG64(666))
before = (rng.random((N,3), dtype=np.float64)*10.0).astype(np.float32)
r = get_random_rotation_matrix(rng, 0.2)
t = get_random_translation_vector(rng, 10.0)
after = (before @ r.T + t)[rng.permutation(N)].astype(np.float32)
cb, ca = pad_cloud(before), pad_cloud(after)
src_mask0 = cb.mask()
perm_s = morton_permutation(cb.points, src_mask0)
src_pts = cb.points[perm_s]; src_mask = src_mask0[perm_s]

def read(x):
    return float(np.asarray(jnp.asarray(x).reshape(-1))[0])

def timeit(fn, reps=3):
    read(fn(0)); t0 = time.perf_counter()
    for i in range(1, reps+1): out = fn(i)
    read(out); return (time.perf_counter()-t0)/reps

def make_icp(g, gsrc, l_budget):
    target = prepare_hier_target(ca.points, ca.mask(), ca.count, g=g)
    jax.block_until_ready(target.packed)
    @jax.jit
    def run(pts):
        st0 = hier_state_init(pts.shape[0])
        def body(carry, _):
            rot, tr, nn = carry
            transformed = pts @ rot.T + tr
            idx, dist, nn = nearest_neighbors_hier(
                transformed, src_mask, target, nn,
                l_budget=l_budget, g=g, gsrc=gsrc)
            matched = target.original_points[idx]
            w = jnp.logical_and(dist < 1e18, src_mask > 0).astype(jnp.float32)
            r_step, t_step = weighted_procrustes(transformed, matched, w)
            return (r_step @ rot, r_step @ tr + t_step, nn), dist.sum()
        (rot, tr, nn), ds = jax.lax.scan(
            body, (jnp.eye(3, dtype=jnp.float32),
                   jnp.zeros(3, jnp.float32), st0), None, length=ITERS)
        return ds[-1]
    return run

for (g, gsrc, L) in [(256,256,160), (256,128,160), (256,256,96),
                     (512,256,96), (128,128,256), (256,512,160)]:
    try:
        run = make_icp(g, gsrc, L)
        dt = timeit(lambda i, run=run: run(src_pts*(1.0+1e-5*i)))
        print(f"g={g:4d} gsrc={gsrc:4d} L={L:4d}: {dt/ITERS*1000:7.2f} ms/iter ({ITERS/dt:6.1f} it/s)")
    except Exception as e:
        print(f"g={g:4d} gsrc={gsrc:4d} L={L:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")
