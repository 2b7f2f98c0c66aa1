"""Sequential scan registration (odometry): align a stream of clouds
pairwise and compose absolute poses.

Beyond-reference scope (the reference registers exactly one pair per
process, ``mainwrapper.cpp:5-54``): the production SLAM workload is a
SEQUENCE of scans, each close to its predecessor.  Three lowerings:

* **scan** (default): k consecutive pairs run inside ONE compiled
  program — a ``lax.scan`` over stacked scans whose carry is the
  previous pair's relative transform (constant-velocity prior — scan
  k+1 tends to continue scan k's motion), threading the seed entirely
  in-program.  Each scan step executes the IDENTICAL per-iteration
  math as ``icp_register`` (the shared ``_icp_loop`` core) with
  patience best-so-far semantics.  This is the dispatch-amortized
  path: the round-4 per-pair lowering measured ~97% of its wall in
  per-pair dispatch latency + host round-trips (9.7x iteration savings
  bought 1.07x wall).  Measured on the chip at 20 scans x 100k
  (``bench_results/sequence_100k.json``, round 5): 17-22 scans/s
  end-to-end including every H2D byte (vs 5.9 per-pair in the same
  recording — ~3x), and the scan program alone registers **67
  pairs/s** device-resident; the remaining end-to-end wall is the
  stream's 24 MB H2D at the relay's measured ~20-40 MB/s, which the
  per-chunk async dispatch overlaps with compute as far as the link
  allows.  Morton sorting is done ONCE per cloud on the host, in a
  thread pool, overlapped with the transfers (performance-only — the
  NN result is order-exact regardless), shared between the cloud's
  source and target roles.
* **per-pair** (``scan=False``): consecutive pairs run through
  ``icp_register`` one by one, seeded through the ``ICPResume`` carry.
  All pairs share one padded shape; note the two static signatures
  (pair 0 cold: divergence_guard on / patience 0; seeded pairs:
  guard off / patience>0) compile two distinct programs.
* **batched** (``batch=True``): all pairs in one
  ``icp_register_batch`` program (vmapped or unrolled by the measured
  crossover).  No cross-pair seeding — use when motion is small and
  throughput beats everything.

For scans arriving ONE AT A TIME (the live-sensor case), use
``SequenceStream`` (``tpuslam.sequence_stream``): one seeded dispatch
per arrival, every cloud transferred and prepared exactly once —
measured 107.9 ms/scan median at 100k and 2.08 s at 1M on the chip
(``bench_results/stream_100k.json`` / ``stream_1m.json``).

Absolute poses compose homogeneously: ``T_k = T_{k-1} ∘ rel_k`` with
``rel_k`` mapping scan k to scan k+1's frame (the reference transform
direction: ``before -> after``).
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpuslam.algorithms.icp import (
    FLT_MAX,
    ICPResume,
    ICPState,
    _icp_loop,
    icp_register,
    resolve_use_spatial,
)
from tpuslam.core.types import Cloud, RigidTransform, pad_cloud, round_up

# patience for seeded pairs (scan + per-pair lowerings): a warm start
# sits immediately in the near-optimum regime where the correspondence
# error fluctuates, so the reference's stop-on-first-error-increase
# guard fires on noise after ~2 iterations and returns seed quality
# (measured drift RMS 3.1 vs 0.50 unseeded at 20x100k,
# tools/probe_seq_seed.py, round-3 numerics); an estimated seed can
# also plateau for a few iterations before descending further, so
# patience must ride out the plateau.  Round-5 chip sweep (patience
# 0/2/4/8/12, tools/sequence_bench.py --patience-sweep): under the
# exact-f32 transforms every setting converges via eps in ~1
# iteration/pair with IDENTICAL drift, so patience is now a safety
# margin for eps-unreachable noise floors, not a tuning knob; 8 kept.
SEED_PATIENCE = 8


class SequenceResult(NamedTuple):
    """Per-pair relative transforms + composed absolute poses.

    ``relative``: K transforms, scan k -> scan k+1 frame.
    ``absolute``: K+1 poses, scan k -> scan 0 frame (pose 0 = identity).
    ``iterations`` / ``errors``: per-pair registration diagnostics.
    """

    relative: List[RigidTransform]
    absolute: List[RigidTransform]
    iterations: np.ndarray  # i32[K]
    errors: np.ndarray  # f32[K]


def _compose(a: RigidTransform, b: RigidTransform) -> RigidTransform:
    """a ∘ b: apply b, then a (homogeneous composition; unit scale —
    odometry steps are rigid)."""
    return RigidTransform(
        rotation=a.rotation @ b.rotation,
        translation=a.rotation @ b.translation + a.translation,
        scale=np.float32(1.0),
    )


def _invert(t: RigidTransform) -> RigidTransform:
    rt = t.rotation.T
    return RigidTransform(rotation=rt, translation=-(rt @ t.translation),
                          scale=np.float32(1.0))


from tpuslam.ops.spatial import host_morton_order as _host_morton_order


@partial(
    jax.jit,
    static_argnames=(
        "use_spatial", "patience", "g", "gsrc", "l_budget", "interpret",
        "use_pallas", "seeded",
    ),
)
def _register_pairs_scanned(
    pts: jnp.ndarray,  # f32[S, P, 3] (Morton-sorted per cloud if spatial)
    counts: jnp.ndarray,  # i32[S]
    seed_r: jnp.ndarray,  # f32[3, 3] — carry entering this chunk
    seed_t: jnp.ndarray,  # f32[3]
    eps: jnp.ndarray,
    max_d2: jnp.ndarray,
    max_iterations: jnp.ndarray,
    use_spatial: bool,
    patience: int,
    g: int,
    gsrc: int,
    l_budget: int,
    interpret: bool,
    use_pallas: Optional[bool],
    seeded: bool = True,
):
    """Register ``pts[k] -> pts[k+1]`` for all S-1 consecutive pairs in
    ONE program: target states prepared vmapped up front (one per
    cloud, no in-loop argsort — rows arrive presorted), then a
    ``lax.scan`` whose carry is the previous pair's relative transform
    and whose step runs the shared ``_icp_loop``.  Returns stacked
    (rotations, translations, iterations, errors).

    Masks are built IN-program from ``counts`` (valid rows always come
    first — the host Morton sort keeps invalid rows last), saving an
    f32[S, P] host->device transfer."""
    msk = (
        jnp.arange(pts.shape[1], dtype=jnp.int32)[None, :]
        < counts[:, None]
    ).astype(jnp.float32)
    if use_spatial:
        from tpuslam.ops.nn_hier import (
            hier_state_init,
            nearest_neighbors_hier_auto,
            prepare_hier_target,
        )

        targets = jax.vmap(
            lambda p, mk, c: prepare_hier_target(
                p, mk, c, g=g, presorted=True
            )
        )(pts[1:], msk[1:], counts[1:])
        xs = (pts[:-1], msk[:-1], targets)
    else:
        from tpuslam.ops.nn import nearest_neighbors

        xs = (pts[:-1], msk[:-1], (pts[1:], counts[1:]))

    def step(carry, x):
        if seeded:
            prev_r, prev_t = carry
        else:  # every pair cold-starts from identity
            prev_r = jnp.eye(3, dtype=jnp.float32)
            prev_t = jnp.zeros((3,), jnp.float32)
        src_pts, src_msk, tgt = x
        if use_spatial:
            def run_nn(transformed, s: ICPState):
                return nearest_neighbors_hier_auto(
                    transformed, src_msk, tgt, s.nn,
                    l_budget=l_budget, g=g, gsrc=gsrc,
                    interpret=interpret,
                )

            def gather_matched(idx, nn_state):
                del idx
                return nn_state.prev_target

            nn_init = hier_state_init(
                src_pts.shape[0], tgt.packed.shape[0]
            )
        else:
            tgt_pts, tgt_count = tgt

            def run_nn(transformed, s: ICPState):
                idx, dist = nearest_neighbors(
                    transformed, tgt_pts, tgt_count,
                    use_pallas=use_pallas,
                )
                return idx, dist, s.nn

            def gather_matched(idx, nn_state):
                del nn_state
                return tgt_pts[idx]

            nn_init = None
        init = ICPState(
            rotation=prev_r,
            translation=prev_t,
            error=jnp.float32(1e5),  # reporting init, basicicp.cpp:26
            prev_error=FLT_MAX,
            iterations=jnp.int32(0),
            done=jnp.asarray(False),
            nn=nn_init,
        )
        res = _icp_loop(
            src_pts, src_msk, run_nn, gather_matched,
            eps, max_d2, max_iterations,
            # patience=0 restores the reference stop-on-error-increase
            # contract (unseeded mode); patience>0 is the seeded-warm-
            # start semantic (see SEED_PATIENCE)
            divergence_guard=patience == 0,
            verbose=False,
            iter_offset=jnp.int32(0),
            init=init,
            patience=patience,
        )
        out = (
            res.transform.rotation, res.transform.translation,
            res.iterations, res.error,
        )
        return (res.transform.rotation, res.transform.translation), out

    (_, _), outs = jax.lax.scan(step, (seed_r, seed_t), xs)
    return outs


def _scan_pairs_per_dispatch(n_pad: int, patience: int) -> int:
    """Pairs per compiled dispatch for the scan lowering: bound device
    time per dispatch (relayed workers die under multi-minute
    programs) with a ~5 s budget at the measured per-iteration model
    (~5 ms at 100k rows scaling ~N^1.3, ``bench_report.json``), and
    each seeded pair costs ~(patience + 2) loop iterations."""
    iter_s = 5e-3 * (max(n_pad, 1) / 102_400) ** 1.3
    per_pair_s = (patience + 2) * iter_s
    return max(1, min(64, int(5.0 / max(per_pair_s, 1e-6))))


def _register_sequence_scanned(
    arrs: List[np.ndarray],
    npad: int,
    eps: float,
    max_distance_squared: float,
    max_iterations: int,
    seed_with_previous: bool,
    use_spatial: Optional[bool],
    patience: Optional[int],
    pairs_per_dispatch: Optional[int],
):
    """The scan lowering's host driver: pad + (spatial) host-Morton-sort
    every cloud once, stack, and dispatch ``pairs_per_dispatch`` pairs
    per compiled program, threading the seed carry across dispatches."""
    use_spatial = resolve_use_spatial(use_spatial, None, npad)
    if use_spatial:
        from tpuslam.ops.nn_hier import (
            _coarse_tile_rows,
            auto_tile_params,
        )

        g, gsrc, l_budget = auto_tile_params(npad)
        npad = round_up(
            npad, max(gsrc, g, _coarse_tile_rows(g, gsrc) or g)
        )
        interpret = jax.default_backend() != "tpu"
    else:
        g = gsrc = l_budget = 0
        interpret = False
    if patience is None:
        patience = SEED_PATIENCE if seed_with_previous else 0

    s = len(arrs)
    counts_h = np.asarray([len(a) for a in arrs], np.int32)

    def prep_one(a):
        if len(a) == npad and use_spatial:
            # full cloud: the sort gather below produces the fresh
            # array — skip the pad memcpy
            return a[_host_morton_order(a, npad)]
        padded = np.zeros((npad, 3), np.float32)
        padded[: len(a)] = a
        if use_spatial:
            order = _host_morton_order(padded, len(a))
            padded = padded[order]
            # invalid rows carry the largest code -> sorted last, so
            # the count-prefix (in-program) mask stays valid on the
            # sorted rows
        return padded

    # sort clouds in a thread pool (argsort releases the GIL) and start
    # each cloud's H2D transfer as soon as it is ready (device_put is
    # async), so transfer overlaps the remaining host sorts — at 20 x
    # 100k the serial version spent ~160 ms sorting THEN ~200 ms
    # transferring on the timed critical path
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        pts_dev = [
            jax.device_put(p) for p in pool.map(prep_one, arrs)
        ]
    counts = jnp.asarray(counts_h)
    eps_d = jnp.float32(eps)
    max_d2_d = jnp.float32(max_distance_squared)
    max_it_d = jnp.int32(max_iterations)

    n_pairs = s - 1
    # cap pairs-per-dispatch at 8 even when the device-time budget
    # allows more: the per-chunk dispatches queue asynchronously (the
    # seed carry is a device array; nothing syncs until the final
    # reads), so later clouds' H2D transfers overlap earlier chunks'
    # compute instead of serializing transfer-then-compute
    chunk = pairs_per_dispatch or min(
        8, _scan_pairs_per_dispatch(npad, patience)
    )
    seed_r = jnp.eye(3, dtype=jnp.float32)
    seed_t = jnp.zeros((3,), jnp.float32)
    rot_l, tr_l, it_l, er_l = [], [], [], []
    for start in range(0, n_pairs, chunk):
        stop = min(start + chunk, n_pairs)
        outs = _register_pairs_scanned(
            jnp.stack(pts_dev[start:stop + 1]),
            counts[start:stop + 1],
            seed_r, seed_t, eps_d, max_d2_d, max_it_d,
            use_spatial=use_spatial, patience=patience,
            g=g, gsrc=gsrc, l_budget=l_budget, interpret=interpret,
            use_pallas=None, seeded=seed_with_previous,
        )
        rot, tr, it, er = outs
        if seed_with_previous:
            # thread the carry to the next chunk ON DEVICE
            seed_r, seed_t = rot[-1], tr[-1]
        rot_l.append(rot)
        tr_l.append(tr)
        it_l.append(it)
        er_l.append(er)
    rot = np.concatenate([np.asarray(x) for x in rot_l])
    tr = np.concatenate([np.asarray(x) for x in tr_l])
    iters = np.concatenate([np.asarray(x) for x in it_l]).astype(np.int32)
    errs = np.concatenate([np.asarray(x) for x in er_l]).astype(np.float32)
    rels = [
        RigidTransform(rotation=rot[k], translation=tr[k],
                       scale=np.float32(1.0))
        for k in range(n_pairs)
    ]
    return rels, iters, errs


class SequenceStream:
    """Incremental odometry: push scans one at a time as a sensor
    delivers them, get the relative transform (previous scan -> new
    scan frame) and the composed absolute pose back.

    This is the streaming counterpart of the scan lowering: every
    cloud is Morton-sorted once on the host and its device artifacts
    (sorted points + prepared hier-NN target state) are RETAINED, so a
    scan is transferred and prepared exactly once and then serves as
    the target of one registration and the source of the next.  Each
    ``push`` is ONE jitted dispatch (the S=2 scan program — compiled
    on the first push, reused for every subsequent one) seeded with
    the previous relative motion; per-push device work at 100k is
    ~2 warm ICP iterations (~15 ms, ``sequence_100k.json``'s
    device-resident rate) plus the new scan's single H2D transfer.

    All scans must fit one padded shape: ``max_points`` bounds them
    (defaults to the first scan's padded size)."""

    def __init__(
        self,
        first_scan,
        eps: float = 1e-3,
        max_distance_squared: float = 1000.0,
        max_iterations: int = 50,
        patience: Optional[int] = None,
        use_spatial: Optional[bool] = None,
        max_points: Optional[int] = None,
    ):
        import jax as _jax

        a = np.asarray(
            first_scan.points[: int(first_scan.count)]
            if isinstance(first_scan, Cloud) else first_scan,
            np.float32,
        )
        npad = round_up(max(max_points or len(a), len(a), 1), 128)
        self._use_spatial = resolve_use_spatial(use_spatial, None, npad)
        if self._use_spatial:
            from tpuslam.ops.nn_hier import (
                _coarse_tile_rows,
                auto_tile_params,
            )

            g, gsrc, l_budget = auto_tile_params(npad)
            npad = round_up(
                npad, max(gsrc, g, _coarse_tile_rows(g, gsrc) or g)
            )
            self._tile = (g, gsrc, l_budget)
            self._interpret = _jax.default_backend() != "tpu"
        else:
            self._tile = (0, 0, 0)
            self._interpret = False
        self._npad = npad
        self._eps = jnp.float32(eps)
        self._max_d2 = jnp.float32(max_distance_squared)
        self._max_it = jnp.int32(max_iterations)
        self._patience = (
            SEED_PATIENCE if patience is None else int(patience)
        )
        self._rel_r = jnp.eye(3, dtype=jnp.float32)
        self._rel_t = jnp.zeros((3,), jnp.float32)
        self._first = True
        eye = RigidTransform(
            rotation=np.eye(3, dtype=np.float32),
            translation=np.zeros(3, np.float32),
            scale=np.float32(1.0),
        )
        self.absolute: List[RigidTransform] = [eye]
        self._prev = self._stage(a)

    def _stage(self, a: np.ndarray):
        """Host-sort + pad + transfer one scan; returns
        (device points f32[P,3], count)."""
        import jax as _jax

        if len(a) > self._npad:
            raise ValueError(
                f"scan has {len(a)} points > max_points={self._npad}"
            )
        padded = np.zeros((self._npad, 3), np.float32)
        padded[: len(a)] = a
        if self._use_spatial:
            padded = padded[_host_morton_order(padded, len(a))]
        return _jax.device_put(padded), np.int32(len(a))

    def push(self, scan) -> RigidTransform:
        """Register ``previous -> scan``; returns the relative
        transform and appends the composed absolute pose."""
        a = np.asarray(
            scan.points[: int(scan.count)]
            if isinstance(scan, Cloud) else scan,
            np.float32,
        )
        new = self._stage(a)
        g, gsrc, l_budget = self._tile
        pts = jnp.stack([self._prev[0], new[0]])
        counts = jnp.asarray(
            [self._prev[1], new[1]], jnp.int32
        )
        outs = _register_pairs_scanned(
            pts, counts, self._rel_r, self._rel_t,
            self._eps, self._max_d2, self._max_it,
            use_spatial=self._use_spatial, patience=self._patience,
            g=g, gsrc=gsrc, l_budget=l_budget,
            interpret=self._interpret, use_pallas=None,
            seeded=not self._first,
        )
        rot, tr = outs[0][0], outs[1][0]
        # the seed carry stays ON DEVICE; only the composed pose
        # crosses to the host
        self._rel_r, self._rel_t = rot, tr
        self._first = False
        self._prev = new
        rel = RigidTransform(
            rotation=np.asarray(rot), translation=np.asarray(tr),
            scale=np.float32(1.0),
        )
        self.absolute.append(_compose(self.absolute[-1], _invert(rel)))
        return rel


def register_sequence(
    clouds: Sequence[np.ndarray],
    eps: float = 1e-3,
    max_distance_squared: float = 1000.0,
    max_iterations: int = 50,
    seed_with_previous: bool = True,
    batch: bool = False,
    scan: Optional[bool] = None,
    use_spatial: Optional[bool] = None,
    patience: Optional[int] = None,
    pairs_per_dispatch: Optional[int] = None,
) -> SequenceResult:
    """Register ``clouds[k] -> clouds[k+1]`` for every consecutive pair
    and compose the absolute trajectory.  Clouds are host arrays (or
    Clouds) of possibly different sizes; all are padded to one common
    lane-aligned shape so every pair reuses the same compiled program.

    ``scan`` (default auto: ON unless ``batch``) picks the
    dispatch-amortized in-program lowering; ``patience`` overrides the
    seeded best-so-far window (None: ``SEED_PATIENCE`` when seeded, 0 —
    the reference divergence-guard contract — when not);
    ``pairs_per_dispatch`` overrides the device-time-budgeted chunking
    of the scan lowering."""
    if len(clouds) < 2:
        raise ValueError("register_sequence needs at least two clouds")
    arrs = [
        np.asarray(c.points[: int(c.count)] if isinstance(c, Cloud) else c,
                   np.float32)
        for c in clouds
    ]
    npad = max(round_up(max(len(a), 1), 128) for a in arrs)

    if batch:
        from tpuslam.algorithms.batch import icp_register_batch, stack_clouds

        bb = stack_clouds(arrs[:-1], multiple=npad)
        ba = stack_clouds(arrs[1:], multiple=npad)
        out = icp_register_batch(
            bb, ba, eps=eps,
            max_distance_squared=max_distance_squared,
            max_iterations=max_iterations, use_spatial=use_spatial,
        )
        rels = [
            RigidTransform(
                rotation=np.asarray(out.transform.rotation[k]),
                translation=np.asarray(out.transform.translation[k]),
                scale=np.float32(1.0),
            )
            for k in range(len(arrs) - 1)
        ]
        iters = np.asarray(out.iterations)
        errs = np.asarray(out.error)
    elif scan or scan is None:
        rels, iters, errs = _register_sequence_scanned(
            arrs, npad, eps, max_distance_squared, max_iterations,
            seed_with_previous, use_spatial, patience,
            pairs_per_dispatch,
        )
    else:
        padded = [pad_cloud(a, multiple=npad) for a in arrs]
        if patience is None:
            patience = SEED_PATIENCE
        rels, iters_l, errs_l = [], [], []
        prev_dev = None  # previous pair's (rotation, translation), ON DEVICE
        for k in range(len(arrs) - 1):
            resume = None
            if seed_with_previous and prev_dev is not None:
                # constant-velocity prior: start from the previous
                # pair's relative motion, handed over as the previous
                # result's DEVICE arrays (a host round-trip per pair
                # costs ~0.5 s through a relayed backend)
                resume = ICPResume(
                    rotation=prev_dev[0],
                    translation=prev_dev[1],
                    error=jnp.float32(1e5),
                    nn=None,
                    done_before=jnp.int32(0),
                    prev_error=jnp.float32(FLT_MAX),
                )
            # seeded pairs replace the reference's stop-on-first-error-
            # increase guard with patience best-so-far semantics (see
            # SEED_PATIENCE); pair 0 keeps the cold-start reference
            # contract — note the two (divergence_guard, patience)
            # static signatures compile two distinct programs
            r = icp_register(
                padded[k], padded[k + 1], eps=eps,
                max_distance_squared=max_distance_squared,
                max_iterations=max_iterations, use_spatial=use_spatial,
                resume=resume,
                divergence_guard=resume is None,
                patience=0 if resume is None else patience,
            )
            rel = RigidTransform(
                rotation=np.asarray(r.transform.rotation),
                translation=np.asarray(r.transform.translation),
                scale=np.float32(1.0),
            )
            rels.append(rel)
            prev_dev = (r.transform.rotation, r.transform.translation)
            iters_l.append(int(r.iterations))
            errs_l.append(float(r.error))
        iters = np.asarray(iters_l, np.int32)
        errs = np.asarray(errs_l, np.float32)

    # scan k's points in scan 0's frame: T_k = rel_1^-1 ∘ ... — the
    # relative transform maps k INTO k+1's frame, so the pose of frame
    # k+1 expressed in frame 0 composes the INVERSES:
    # x_{k+1} = rel_k(x_k)  =>  x_0 = T_k(x_k), T_{k+1} = T_k ∘ rel_k^-1
    eye = RigidTransform(
        rotation=np.eye(3, dtype=np.float32),
        translation=np.zeros(3, np.float32),
        scale=np.float32(1.0),
    )
    absolute = [eye]
    for rel in rels:
        absolute.append(_compose(absolute[-1], _invert(rel)))
    return SequenceResult(
        relative=rels, absolute=absolute, iterations=iters, errors=errs
    )
