"""Bisect which structural piece of cpd_register's Hybrid-split loop
costs ~0.7 s/iter over the bare FGT body at 376k.

Variants (3 wide iterations each, all dynamic-trip):
  V0 bare:    while { fgt }                       (the 0.12/iter case)
  V1 mstep:   while { fgt + mstep + CPDState }
  V2 freeze:  V1 + freeze wrapper
  V3 nested:  outer while { inner_fast(V2); inner_slow(V2-exact) }
  V4 real:    cpd_register(Hybrid, use_fgt=True) (the 0.86/iter case)
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

from tpuslam.algorithms.cpd import (
    CPDState,
    cpd_estep_auto,
    cpd_estep_fgt,
    cpd_mstep,
    cpd_register,
    sigma_squared_init,
    uniform_constant,
)
from tpuslam.config.configuration import ApproximationType
from tpuslam.core.types import pad_cloud
from tpuslam.data.loader import load_cloud

SIZE = 376_401


def main():
    pts = load_cloud(f"synthetic://{SIZE}").astype(np.float32)
    cb = pad_cloud(pts)
    ca = pad_cloud(pts)
    mm = (jnp.arange(cb.points.shape[0]) < cb.count).astype(jnp.float32)
    nm = mm
    moving, target = cb.points, ca.points
    s2_0 = sigma_squared_init(moving, mm, target, nm)
    m = n = jnp.sum(mm)
    c_init = uniform_constant(s2_0, 0.1, m, n)
    print(f"backend={jax.default_backend()}", flush=True)

    def fgt(x, sig):
        return cpd_estep_fgt(
            x, mm, target, nm, sig, jnp.float32(0.1), m, n,
            128, 8, 10.0, sigma2_init=s2_0,
        )

    def exact(x, sig):
        return cpd_estep_auto(
            x, mm, target, nm, sig, c_init, jnp.asarray(True),
        )

    def init_state():
        return CPDState(
            rotation=jnp.eye(3, dtype=jnp.float32),
            translation=jnp.zeros((3,), jnp.float32),
            scale=jnp.float32(1.0),
            sigma2=s2_0,
            log_likelihood=jnp.float32(0.0),
            ntol=jnp.float32(10.0),
            iterations=jnp.int32(0),
        )

    def em_body(estep):
        def _body(s):
            transformed = s.scale * (moving @ s.rotation.T) + s.translation
            stats = estep(transformed, s.sigma2)
            ntol = jnp.abs(
                (stats.error - s.log_likelihood) / stats.error
            )
            mres = cpd_mstep(moving, target, stats, True, s.scale)
            return CPDState(
                rotation=mres.rotation, translation=mres.translation,
                scale=mres.scale, sigma2=mres.sigma2,
                log_likelihood=stats.error, ntol=ntol,
                iterations=s.iterations + 1,
            )
        return _body

    def overall_cond(max_it):
        def cond(s):
            return jnp.logical_and(
                jnp.logical_and(s.iterations < max_it,
                                jnp.isfinite(s.log_likelihood)),
                jnp.logical_and(s.ntol > 1e-4, s.sigma2 > 1e-3),
            )
        return cond

    def freeze(body_fn, cond_fn):
        def wrapped(s):
            new_s = body_fn(s)
            keep = cond_fn(s)
            return jax.tree.map(
                lambda o, nw: jnp.where(keep, nw, o), s, new_s
            )
        return wrapped

    def timed(label, fn):
        float(fn(jnp.float32(0)).sigma2)
        t0 = time.perf_counter()
        out = fn(jnp.float32(1e-5))
        float(out.sigma2)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.3f} s ({dt/3:.3f}/iter) "
              f"iters={int(out.iterations)}", flush=True)

    cond3 = overall_cond(jnp.int32(3))

    @jax.jit
    def v1(p):
        mv = moving * (1.0 + p)
        body = em_body(lambda x, sig: fgt(x, sig))

        def _b(s):
            tr = s.scale * (mv @ s.rotation.T) + s.translation
            stats = fgt(tr, s.sigma2)
            ntol = jnp.abs((stats.error - s.log_likelihood) / stats.error)
            mres = cpd_mstep(mv, target, stats, True, s.scale)
            return CPDState(mres.rotation, mres.translation, mres.scale,
                            mres.sigma2, stats.error, ntol,
                            s.iterations + 1)
        del body
        return jax.lax.while_loop(cond3, _b, init_state())

    timed("V1 while{fgt+mstep}", v1)

    @jax.jit
    def v2(p):
        mv = moving * (1.0 + p)

        def _b(s):
            tr = s.scale * (mv @ s.rotation.T) + s.translation
            stats = fgt(tr, s.sigma2)
            ntol = jnp.abs((stats.error - s.log_likelihood) / stats.error)
            mres = cpd_mstep(mv, target, stats, True, s.scale)
            return CPDState(mres.rotation, mres.translation, mres.scale,
                            mres.sigma2, stats.error, ntol,
                            s.iterations + 1)
        return jax.lax.while_loop(cond3, freeze(_b, cond3), init_state())

    timed("V2 +freeze", v2)

    @jax.jit
    def v3(p):
        mv = moving * (1.0 + p)

        def mk(estep):
            def _b(s):
                tr = s.scale * (mv @ s.rotation.T) + s.translation
                stats = estep(tr, s.sigma2)
                ntol = jnp.abs(
                    (stats.error - s.log_likelihood) / stats.error
                )
                mres = cpd_mstep(mv, target, stats, True, s.scale)
                return CPDState(mres.rotation, mres.translation,
                                mres.scale, mres.sigma2, stats.error,
                                ntol, s.iterations + 1)
            return _b

        def fast_now(s):
            return s.sigma2 > 0.015 * s2_0

        def cond_f(s):
            return jnp.logical_and(cond3(s), fast_now(s))

        def cond_s(s):
            return jnp.logical_and(
                cond3(s), jnp.logical_not(fast_now(s))
            )

        bf = freeze(mk(fgt), cond_f)
        bs = freeze(mk(exact), cond_s)

        def outer(s):
            s = jax.lax.while_loop(cond_f, bf, s)
            return jax.lax.while_loop(cond_s, bs, s)

        return jax.lax.while_loop(cond3, outer, init_state())

    # V3 (nested under an outer while) is RETIRED: it fails to compile —
    # XLA internal RET_CHECK ShapeUtil::Compatible in while simplification
    # (recorded 2026-08-20); cpd_register now uses a flat sequence.
    del v3

    @jax.jit
    def v4(p):
        res = cpd_register(
            cb._replace(points=moving * (1.0 + p)), ca,
            weight=0.1, const_scale=True, tolerance=1e-4,
            max_iterations=3,
            approximation_type=ApproximationType.Hybrid, use_fgt=True,
        )
        return CPDState(res.transform.rotation,
                        res.transform.translation, res.transform.scale,
                        res.error, res.error, res.error,
                        res.iterations)

    timed("V4 cpd_register (device-resident input)", v4)

    # V5: like V4 but Full ladder — isolates the Hybrid arms' presence
    @jax.jit
    def v5(p):
        res = cpd_register(
            cb._replace(points=moving * (1.0 + p)), ca,
            weight=0.1, const_scale=True, tolerance=1e-4,
            max_iterations=3,
            approximation_type=ApproximationType.Full, use_fgt=True,
        )
        return CPDState(res.transform.rotation,
                        res.transform.translation, res.transform.scale,
                        res.error, res.error, res.error,
                        res.iterations)

    timed("V5 cpd_register Full ladder", v5)


if __name__ == "__main__":
    main()
