"""Method dispatch: one registration API over all algorithms.

The TPU equivalent of the reference's dispatch switches
(``cpumain.cpp:11-24``, ``gpumain.cpp:12-38``) and its shared ``SlamFunc``
signature (``testrunner.h:8``): ``run_with_configuration(before, after,
config) -> (rotation, translation, iterations, error)``.  There is ONE
implementation per method (no CPU/GPU twins): the same jitted code runs on
CPU jax in tests and on TPU in production (SURVEY §1 "key architectural
idea").
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

from tpuslam.config.configuration import (
    ApproximationType,
    ComputationMethod,
    Configuration,
)
from tpuslam.core.types import pad_cloud

# (rotation f32[3,3], translation f32[3], iterations, error)
SlamResult = Tuple[np.ndarray, np.ndarray, int, float]
SlamFunc = Callable[[np.ndarray, np.ndarray, Configuration], SlamResult]

_REGISTRY: Dict[ComputationMethod, SlamFunc] = {}


def register(method: ComputationMethod):
    def deco(fn: SlamFunc) -> SlamFunc:
        _REGISTRY[method] = fn
        return fn

    return deco


def get_slam_func(method: ComputationMethod) -> SlamFunc:
    if method not in _REGISTRY:
        raise KeyError(f"no implementation registered for {method}")
    return _REGISTRY[method]


def run_with_configuration(
    before: np.ndarray, after: np.ndarray, config: Configuration
) -> SlamResult:
    return get_slam_func(config.computation_method)(before, after, config)


def icp_chunk_size(
    n_max: int, max_iterations: int, backend: str, chunk_env=None
) -> int:
    """Iterations per dispatch for chunked ICP (0 = whole loop at once).

    The failure mode this guards against is dispatch DURATION (relayed
    TPU workers die under multi-minute single XLA programs), so the gate
    estimates work (points x iterations) rather than size alone: a
    480k-point 200-iteration run is as long-dispatched as a 1M-point
    50-iteration one.  An unbounded run (``max_iterations == -1``) is
    ALWAYS chunked — its total work is unknowable up front, and a run
    that converges quickly exits after its first short dispatch anyway.
    """
    if chunk_env is not None:
        try:
            return max(0, int(chunk_env))
        except ValueError:
            # fail SAFE: a typo'd override must not silently disable
            # chunking — that re-creates the exact multi-minute-dispatch
            # crash mode this gate exists to prevent
            print(
                f"[tpuslam] ignoring malformed TPUSLAM_ICP_CHUNK="
                f"{chunk_env!r}; using the automatic gate"
            )
    if backend != "tpu":
        return 0
    # size each dispatch at ~512k x 10 point-iterations (~5 s on v5e)
    per_dispatch = max(1, min(50, (512_000 * 10) // max(n_max, 1)))
    if max_iterations == -1:
        return per_dispatch
    # trigger at the work of 512k points x 50 iterations
    if n_max * max(max_iterations, 1) >= 512_000 * 50:
        return per_dispatch
    return 0


def cpd_chunk_size(
    n_max: int, m_max: int, max_iterations: int, backend: str,
    chunk_env=None, fgt_fast_phase: bool = False,
    truncated_slow: bool = False,
) -> int:
    """EM iterations per dispatch for chunked CPD (0 = whole loop).

    CPD's per-iteration cost is O(N*M) pairs (the E-step), ~N times an
    ICP NN iteration's effective cost on the hier path, so the gate is
    PAIRS-based: one dispatch is sized at ~2e11 pair-evaluations (~4.6 s
    at the measured 43.4 Gpairs/s E-step rate, ``bench_report.json``),
    and chunking triggers at 5 dispatches' worth of total work.  CPD's
    ``max_iterations = -1`` runs ZERO iterations (reference quirk,
    ``coherentpointdrift.cpp:104``) and is never chunked.

    ``fgt_fast_phase``: sizes a dispatch of device-FGT iterations
    (Full with FGT, or Hybrid's FAST phase — the caller passes the
    phase it is sizing, see ``_run_cpd``).  The FGT is O(N+M), so a
    pairs budget is the wrong unit; the dispatch is sized directly at
    ~6 s of device time from the measured ~0.4 us/point per-iteration
    rate (``bench_results/cpd_large.json``: 0.294 s/iter at 376k+376k)
    — at mustang scale ~19 iterations/dispatch, far below the relay's
    multi-minute danger zone, vs the round-4 single 4x-pairs budget
    whose 5-iteration dispatches paid a relayed dispatch latency per
    1.5 s of device work (VERDICT r4) and whose application to the
    WHOLE Hybrid run let a slow-phase dispatch overrun the exact
    kernel's device-time bound ~4x (ADVICE r4)."""
    if chunk_env is not None:
        try:
            return max(0, int(chunk_env))
        except ValueError:
            print(
                f"[tpuslam] ignoring malformed TPUSLAM_CPD_CHUNK="
                f"{chunk_env!r}; using the automatic gate"
            )
    if backend != "tpu" or max_iterations <= 0:
        return 0
    pairs = max(n_max, 1) * max(m_max, 1)
    if pairs * max_iterations < 5 * 2e11:
        return 0
    if fgt_fast_phase:
        points = max(n_max + m_max, 1)
        return max(1, min(50, int(6.0 / (points * 4e-7))))
    # Hybrid's slow phase always truncates, which runs the candidate
    # (tile-skipping) kernel at a measured >=2.4x the dense-exact rate
    # at mustang scale (bench_results/cpd_large.json estep_cand rows);
    # its dispatch budget is scaled to keep ~5 s of device time at the
    # WORST measured truncated rate rather than starving each dispatch
    # to 1 iteration on the dense budget
    budget = 1.2e12 if truncated_slow else 2e11
    return max(1, min(50, int(budget // pairs)))


@register(ComputationMethod.Icp)
def _run_icp(
    before: np.ndarray, after: np.ndarray, config: Configuration
) -> SlamResult:
    """Mirrors ``CalculateICPWithConfiguration`` (``basicicp.cpp:12-21``)."""
    import os

    import jax

    from tpuslam.algorithms.icp import icp_register, icp_register_chunked

    max_iterations = (
        int(config.max_iterations) if config.max_iterations is not None else -1
    )
    # long dispatches: bound single-dispatch device time by running the
    # loop in warm-started chunks (identical trajectory — see
    # icp_register_chunked and icp_chunk_size).
    # TPUSLAM_ICP_CHUNK=0 disables, =N forces N iterations per chunk.
    chunk = icp_chunk_size(
        max(before.shape[0], after.shape[0]),
        max_iterations,
        jax.default_backend(),
        os.environ.get("TPUSLAM_ICP_CHUNK"),
    )
    common = dict(
        eps=config.convergence_epsilon,
        max_distance_squared=config.max_distance_squared,
        max_iterations=max_iterations,
    )
    # TPUSLAM_ICP_CKPT=path persists every chunk boundary so a killed
    # run (`python -m tpuslam cfg.json`) continues from disk
    # (tpuslam.harness.checkpoint); checkpointing requires the chunked
    # driver (the boundary is the durable unit), so setting it forces
    # chunked dispatch even below the auto-chunk work gate / off-TPU
    ckpt = os.environ.get("TPUSLAM_ICP_CKPT")
    if config.icp_prealign:
        from tpuslam.algorithms.icp import icp_register_prealigned

        result = icp_register_prealigned(
            pad_cloud(before), pad_cloud(after), chunk=chunk,
            subcloud_size=config.nicp_subcloud_size,
            seed=config.random_seed if config.random_seed is not None else 0,
            checkpoint_path=ckpt,
            **common,
        )
    elif chunk or ckpt:
        result = icp_register_chunked(
            pad_cloud(before), pad_cloud(after), chunk=chunk or 10,
            checkpoint_path=ckpt,
            **common,
        )
    else:
        result = icp_register(pad_cloud(before), pad_cloud(after), **common)
    return (
        np.asarray(result.transform.rotation),
        np.asarray(result.transform.translation),
        int(result.iterations),
        float(result.error),
    )


@register(ComputationMethod.NoniterativeIcp)
def _run_nicp(
    before: np.ndarray, after: np.ndarray, config: Configuration
) -> SlamResult:
    """Mirrors ``CalculateNonIterativeWithConfiguration``
    (``noniterative.cpp:14-23``)."""
    from tpuslam.algorithms.nicp import degenerate_axes_for, nicp_register

    # degenerate-spectrum hardening (extension; VERDICT r2 weak #2):
    # a cheap host-side eigengap pre-pass decides STATICALLY whether the
    # principal axes are ambiguous (near-tied eigenvalues) and widens
    # the candidate set with in-plane rotations when they are.  Config
    # knob nicp-degenerate-widening: absent = this auto pass, 0 = off,
    # N = force N angles per degenerate axis.
    widen = config.nicp_degenerate_widening
    if widen is None:
        axes = degenerate_axes_for(before, after)
        angles = 16 if axes else 0
    elif widen > 1:
        axes = degenerate_axes_for(before, after) or (0,)
        angles = widen
    else:
        axes, angles = (), 0

    result = nicp_register(
        pad_cloud(before),
        pad_cloud(after),
        eps=config.convergence_epsilon,
        approximation_type=config.approximation_type,
        subcloud_size=config.nicp_subcloud_size,
        seed=config.random_seed if config.random_seed is not None else 0,
        degenerate_angles=angles,
        degenerate_axes=axes,
    )
    return (
        np.asarray(result.transform.rotation),
        np.asarray(result.transform.translation),
        int(result.iterations),
        float(result.error),
    )


@register(ComputationMethod.Cpd)
def _run_cpd(
    before: np.ndarray, after: np.ndarray, config: Configuration
) -> SlamResult:
    """Mirrors ``CalculateCpdWithConfiguration``
    (``coherentpointdrift.cpp:43-65``).  NOTE the parser truth: a missing
    ``max-iterations`` maps to -1 and the reference's EM loop condition
    ``iterations < maxIterations`` is then immediately false — zero
    iterations, identity result (``coherentpointdrift.cpp:104``).  We
    reproduce that."""
    import os

    import jax

    from tpuslam.algorithms.cpd import cpd_register, cpd_register_chunked

    max_iterations = (
        int(config.max_iterations) if config.max_iterations is not None else -1
    )
    common = dict(
        eps=config.convergence_epsilon,
        weight=config.cpd_weight,
        const_scale=config.cpd_const_scale,
        max_iterations=max_iterations,
        tolerance=config.cpd_tolerance,
        approximation_type=config.approximation_type,
        ratio_of_far_field=config.ratio_of_far_field,
        order_of_truncation=config.order_of_truncation,
        use_fgt=config.cpd_use_fgt,
        centroid_init=config.cpd_centroid_init,
    )
    # bound single-dispatch device time at large sizes (pairs-based
    # gate — one mustang-scale E-step is already seconds).  The gate's
    # FGT arm must match the arm cpd_register will actually resolve, so
    # derive it from the SAME padded arrays that are passed down rather
    # than re-deriving the padding independently.
    from tpuslam.algorithms.cpd import resolve_use_fgt

    padded_before, padded_after = pad_cloud(before), pad_cloud(after)
    fgt_fast = config.approximation_type in (
        ApproximationType.Full, ApproximationType.Hybrid,
    ) and resolve_use_fgt(
        config.cpd_use_fgt, config.approximation_type,
        padded_before.points.shape[0], padded_after.points.shape[0],
    )
    chunk_env = os.environ.get("TPUSLAM_CPD_CHUNK")
    chunk = cpd_chunk_size(
        before.shape[0], after.shape[0], max_iterations,
        jax.default_backend(), chunk_env,
        # Full-with-FGT runs the device FGT EVERY iteration, so its one
        # chunk size is the FGT-rate size; Hybrid sizes its slow
        # (truncated candidate-kernel) dispatches here and its fast
        # dispatches below
        fgt_fast_phase=(
            fgt_fast
            and config.approximation_type == ApproximationType.Full
        ),
        # only when the fast phase is the FGT: hybrid-below-crossover
        # runs its WIDE (untruncated, dense-rate) fast phase on this
        # same chunk size, so it keeps the dense budget
        truncated_slow=(
            fgt_fast
            and config.approximation_type == ApproximationType.Hybrid
        ),
    )
    chunk_fast = None
    if fgt_fast and config.approximation_type == ApproximationType.Hybrid:
        chunk_fast = cpd_chunk_size(
            before.shape[0], after.shape[0], max_iterations,
            jax.default_backend(), chunk_env, fgt_fast_phase=True,
        )
    # setting TPUSLAM_CPD_CKPT forces the chunked driver (same contract
    # as TPUSLAM_ICP_CKPT: the chunk boundary is the durable unit)
    ckpt = os.environ.get("TPUSLAM_CPD_CKPT")
    if chunk or ckpt:
        result = cpd_register_chunked(
            padded_before, padded_after, chunk=chunk or 10,
            chunk_fast=chunk_fast or None,
            checkpoint_path=ckpt,
            **common,
        )
    else:
        result = cpd_register(padded_before, padded_after, **common)
    # the reference returns (scale * R, t) (coherentpointdrift.cpp:123)
    rotation = np.asarray(result.transform.scale) * np.asarray(
        result.transform.rotation
    )
    return (
        rotation,
        np.asarray(result.transform.translation),
        int(result.iterations),
        float(result.error),
    )
